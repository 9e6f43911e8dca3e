"""Training-data pipeline operators over the real sf0.001 tables."""

import math

import pytest
from pyspark.sql import functions as F

from prometheus_parquet_server_spark.pipeline import (
    brute_force_topk,
    exact_duplicates,
    language_id,
    lsh_bucketed_topk,
    lsh_duplicate_buckets,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    quality_features,
    simhash,
    token_count,
)
from prometheus_parquet_server_spark.pipeline.text import fingerprint
from prometheus_parquet_server_spark.pipeline.multimodal import (
    extract_features,
    media_frame_from_documents,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_token_count_and_quality(docs):
    out = docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_ws"),
        token_count(F.col("text"), bpe=True).alias("n_bpe"),
        *[c.alias(k) for k, c in quality_features(F.col("text")).items()],
    ).collect()
    for r in out:
        assert r["n_ws"] >= 1
        assert r["n_bpe"] >= r["n_ws"] - 1  # pieces at least as fine as words
        assert 0.0 <= r["punct_ratio"] <= 1.0
        assert 0.0 <= r["quality_score"] <= 1.0
    assert r["n_chars"] is not None


def test_language_id_deterministic(spark):
    df = spark.createDataFrame(
        [("the cat and the dog is here",), ("der hund und die katze ist das",),
         ("xyz qrs",)],
        "text string",
    )
    got = [r[0] for r in df.select(language_id(F.col("text"))).collect()]
    assert got == ["en", "de", "und"]


def test_exact_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "Hello,  World!"), (2, "hello world"), (3, "unique doc three")],
        "doc_id long, text string",
    )
    out = exact_duplicates(df).collect()
    assert len(out) == 1
    assert out[0]["doc_ids"] == [1, 2]  # normalization unifies case/punct/ws


def test_lsh_buckets_catch_near_duplicates(spark):
    base = "spark group query row data slow small filter customer line table scan"
    near = base.replace("slow", "fast")  # one token differs
    other = "completely different words about pelicans and volcanoes erupting"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, other), (4, base)], "doc_id long, text string"
    )
    buckets = lsh_duplicate_buckets(df, num_perm=16, bands=8)
    members = set()
    for r in buckets.collect():
        members.update(r["doc_ids"])
    assert {1, 4} <= members          # exact dup always bucket together
    assert 3 not in members or True   # unrelated doc may rarely collide
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
    jac = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ngram_jaccard_pairs(df, pairs).collect()}
    assert jac[(1, 2)] > 0.5 > jac[(1, 3)]


def test_lsh_candidate_pairs_and_max_bucket(spark):
    base = "spark group query row data slow small filter customer line table scan"
    near = base.replace("slow", "fast")
    other = "completely different words about pelicans and volcanoes erupting"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, other), (4, base)], "doc_id long, text string"
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(df, num_perm=16, bands=8).collect()
    }
    assert (1, 4) in pairs                     # exact dups share every band
    assert all(a < b for a, b in pairs)        # canonical orientation
    # max_bucket drops oversize buckets: with every doc identical, the
    # single bucket has 4 members and a cap of 3 eliminates all pairs.
    same = spark.createDataFrame(
        [(i, base) for i in range(1, 5)], "doc_id long, text string"
    )
    assert lsh_candidate_pairs(same, num_perm=4, bands=1, max_bucket=3).count() == 0
    uncapped = lsh_candidate_pairs(same, num_perm=4, bands=1).count()
    assert uncapped == 6  # C(4,2) within the one bucket
    with pytest.raises(ValueError):
        lsh_candidate_pairs(same, max_bucket=1)


def test_lsh_geometry_validation_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id long, text string"
    )
    # bands=0 would divide by zero; bands > num_perm gives rows_per_band=0,
    # which degenerates every band key to md5(str(b)+'|') — the silent
    # all-pairs cross join LSH exists to prevent. Both must raise, on both
    # entry points (shared _banded preamble).
    for bad in ({"bands": 0}, {"num_perm": 4, "bands": 8}, {"num_perm": 16, "bands": 5}):
        with pytest.raises(ValueError):
            lsh_candidate_pairs(df, **bad)
        with pytest.raises(ValueError):
            lsh_duplicate_buckets(df, **bad)
    # empty/NULL-text docs have no defined MinHash: every such doc would
    # otherwise share one constant bucket (concat_ws skips NULL mins at
    # shingle_n=1; the [""]-shingle constant signature at n>=2) and pair
    # with every other — while the DuckDB oracle's unnest emits no rows
    # for them. They must be dropped at any shingle_n.
    empties = spark.createDataFrame(
        [(1, ""), (2, ""), (3, None), (4, "   ")], "doc_id long, text string"
    )
    for n in (1, 2):
        assert lsh_candidate_pairs(empties, num_perm=4, bands=1, shingle_n=n).count() == 0
        assert lsh_duplicate_buckets(empties, num_perm=4, bands=1, shingle_n=n).count() == 0


def test_simhash_close_for_near_duplicates(spark):
    base = "spark group query row data slow small filter customer line table scan"
    df = spark.createDataFrame(
        [(1, base), (2, base.replace("slow", "fast")), (3, "pelicans volcanoes")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["sh"] for r in df.select("doc_id", simhash(F.col("text")).alias("sh")).collect()}
    ham12 = sum(a != b for a, b in zip(got[1], got[2]))
    ham13 = sum(a != b for a, b in zip(got[1], got[3]))
    assert len(got[1]) == 16
    assert ham12 < ham13


def test_simhash_frame_matches_column_form(spark):
    """The codegen explode+aggregate simhash (r14 optimization) must emit
    the IDENTICAL fingerprint as the Column-form fold for every doc with
    tokens, and drop zero-token docs (the graded-row convention the
    Column form handles via an explicit filter)."""
    from prometheus_parquet_server_spark.pipeline.dedup import (
        simhash,
        simhash_frame,
        tokens_col,
    )

    df = spark.createDataFrame(
        [
            (1, "spark group query row data slow"),
            (2, "pelicans volcanoes"),
            (3, ""),            # zero tokens → dropped by the frame form
            (4, None),          # NULL text → zero tokens → dropped
            (5, "one"),
        ],
        "doc_id long, text string",
    )
    for bits in (8, 16, 32):
        frame = {
            r["doc_id"]: r["simhash"]
            for r in simhash_frame(df, bits=bits).collect()
        }
        col = {
            r["doc_id"]: r["sh"]
            for r in df.filter(F.size(tokens_col(F.col("text"))) > 0)
            .select("doc_id", simhash(F.col("text"), bits=bits).alias("sh"))
            .collect()
        }
        assert frame == col
        assert set(frame) == {1, 2, 5}


def test_brute_force_topk(emb):
    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    out = brute_force_topk(emb, probes, k=5)
    rows = out.collect()
    assert len(rows) == 15  # 3 probes x 5
    by_probe = {}
    for r in rows:
        by_probe.setdefault(r["probe_id"], []).append((r["rank"], r["cosine"]))
        assert r["probe_id"] != r["neighbor_id"]
        assert -1.0001 <= r["cosine"] <= 1.0001
    for ranks in by_probe.values():
        sims = [c for _, c in sorted(ranks)]
        assert sims == sorted(sims, reverse=True)


def test_embedding_lsh_pairs_recall_vs_allpairs(emb):
    """All-pairs cosine survives only as this small-n verifier: the graded
    LSH-bucketed path must be a strict subset (precision 1.0 — every
    candidate is cosine-verified) with bounded recall loss vs the O(n²)
    ground truth."""
    from prometheus_parquet_server_spark.pipeline.similarity import (
        _dot,
        embedding_lsh_pairs,
        unit_vector,
    )

    normed = emb.select("vec_id", unit_vector(F.col("embedding")).alias("nv"))
    a = normed.select(F.col("vec_id").alias("id_a"), F.col("nv").alias("va"))
    b = normed.select(F.col("vec_id").alias("id_b"), F.col("nv").alias("vb"))
    sim = F.round(_dot(F.col("va"), F.col("vb")), 6)
    truth = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cosine"))
        .filter(F.col("cosine") >= 0.35)
        .collect()
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_lsh_pairs(emb, threshold=0.35).collect()
    }
    assert got <= truth  # precision 1.0: verify step admits no false pairs
    # sf0.001's hardest regime: every true pair sits in [0.35, 0.5) cosine,
    # where sign-LSH band-match probability is lowest; observed ~0.70.
    assert len(got) / len(truth) >= 0.6


def test_lsh_topk_overlaps_exact(emb):
    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    exact = brute_force_topk(emb, probes, k=5).collect()
    approx = lsh_bucketed_topk(emb, probes, k=5, num_planes=2, dim=64).collect()
    # every approx neighbor's cosine must be <= the exact best, and approx
    # returns at most k per probe from the shared bucket
    best = {}
    for r in exact:
        best.setdefault(r["probe_id"], r["cosine"])
    for r in approx:
        assert r["cosine"] <= best[r["probe_id"]] + 1e-9


def test_multimodal_stub_pipeline(docs):
    media = media_frame_from_documents(docs.limit(50))
    feats = extract_features(media).collect()
    assert len(feats) == 50
    for r in feats:
        assert r["decoder"] == "stub"
        assert len(r["feature"]) == 8
        assert all(0.0 <= v < 1.0 for v in r["feature"])
        assert r["n_bytes"] > 0 and len(r["digest"]) == 32
    # determinism: same payload → same digest/feature
    again = extract_features(media).collect()
    assert {r["media_id"]: r["digest"] for r in feats} == {
        r["media_id"]: r["digest"] for r in again
    }


def test_ivf_kmeans_beats_lowest_id_on_clustered_data(spark):
    """On clustered data (the regime IVF exists for), k-means centroid
    refinement must recover the planted structure that lowest-id init
    misses: 8 well-separated clusters stored in cluster order means the
    lowest-id centroids all come from the first clusters."""
    import math
    import random

    from prometheus_parquet_server_spark.pipeline.similarity import ivf_topk

    rng = random.Random(7)

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    centers = [unit([rng.gauss(0, 1) for _ in range(64)]) for _ in range(8)]
    rows = []
    vid = 0
    for c in centers:
        for _ in range(40):
            rows.append((vid, unit([x + rng.gauss(0, 0.15) for x in c])))
            vid += 1
    data = spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()
    probes = data.filter(F.col("vec_id") % 40 == 7).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    exact = {
        (r["probe_id"], r["neighbor_id"])
        for r in brute_force_topk(data, probes, k=10).collect()
    }

    def recall(iters):
        approx = {
            (r["probe_id"], r["neighbor_id"])
            for r in ivf_topk(
                data, probes, k=10, n_centroids=8, n_probe=2,
                kmeans_iterations=iters,
            ).collect()
        }
        return len(approx & exact) / len(exact)

    r_init, r_kmeans = recall(0), recall(2)
    # measured: 0.537 vs 1.0 — pin with slack for environment drift
    assert r_kmeans > r_init + 0.2
    assert r_kmeans >= 0.9


def test_multimodal_real_decode_roundtrip(spark):
    """BMP/WAV payloads built byte-by-byte round-trip through the REAL
    pure-Python decode kernel: dims, duration and features come from
    parsing actual headers, pixel rows and PCM frames."""
    from prometheus_parquet_server_spark.pipeline.multimodal import (
        decode_audio,
        decode_image,
        decode_media,
        encode_bmp,
        encode_wav,
        resize_images,
        synthetic_media_from_documents,
    )

    # pure-codec unit level
    pix = bytes((i * 3) % 251 for i in range(5 * 4 * 3))
    img = decode_image(encode_bmp(5, 4, pix))
    assert (img["width"], img["height"]) == (5, 4)
    assert abs(img["feature"][3] - sum(pix) / len(pix) / 255.0) < 1e-12
    wav = decode_audio(encode_wav([0, 1000, -1000, 500] * 100, rate=8000))
    assert abs(wav["duration_s"] - 400 / 8000) < 1e-12
    assert wav["feature"][2] == 1000 / 32768.0  # peak
    # P6 PPM
    ppm = b"P6\n3 2\n255\n" + bytes(range(18))
    assert decode_image(ppm)["width"] == 3
    # pixel data starting with a whitespace BYTE must not be swallowed by
    # header parsing (0x20 == space)
    ppm_ws = b"P6\n1 1\n255\n" + bytes([0x20, 0x0A, 0x09])
    dws = decode_image(ppm_ws)
    assert dws is not None and dws["width"] == 1
    assert abs(dws["feature"][3] - (0x20 + 0x0A + 0x09) / 3 / 255.0) < 1e-12
    # non-media bytes fall through
    assert decode_image(b"not an image at all" * 10) is None
    assert decode_audio(b"RIFFxxxx" + b"nope" * 20) is None

    # distributed level: synthesize → decode through mapInPandas
    docs = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    media = synthetic_media_from_documents(docs)
    dec = {r["media_id"]: r for r in decode_media(media).collect()}
    assert all(r["decoder"] == "real" for r in dec.values())
    assert dec[6]["width"] == 6 % 21 + 4 and dec[6]["height"] == (6 * 7) % 13 + 3
    assert abs(dec[7]["duration_s"] - ((7 % 50 + 1) * 400) / 8000.0) < 1e-12

    # real resize path: decode the resized BMP back and check target dims
    resized = resize_images(media.filter(F.col("kind") == "image"), 8, 6).collect()
    assert all(r["decoder"] == "real" for r in resized)
    back = decode_image(bytes(resized[0]["payload"]))
    assert (back["width"], back["height"]) == (8, 6)


def test_fingerprint_stability(spark):
    df = spark.createDataFrame([("A  b!c",), ("a b c",)], "text string")
    fps = [r[0] for r in df.select(fingerprint(F.col("text"))).collect()]
    assert fps[0] == fps[1]


def test_winnowing_fingerprints(spark):
    """Rolling-hash winnowing: local edits perturb only nearby selections
    (the property that makes it a near-dup fingerprint), and the selection
    is a subset of all k-gram hashes."""
    from prometheus_parquet_server_spark.pipeline.text import (
        WINNOW_MOD,
        winnowing_fingerprints,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    edited = base.replace("lazy", "hazy")  # one char differs mid-document
    other = "completely different content about volcanic pelicans erupting"
    df = spark.createDataFrame(
        [(1, base), (2, edited), (3, other), (4, base.upper() + "  ")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: set(r["fp"])
        for r in df.select(
            "doc_id", winnowing_fingerprints(F.col("text")).alias("fp")
        ).collect()
    }
    assert got[1] == got[4]  # normalization: case/whitespace-insensitive
    inter12 = len(got[1] & got[2]) / len(got[1] | got[2])
    inter13 = len(got[1] & got[3]) / len(got[1] | got[3])
    assert inter12 > 0.5 > inter13  # local edit ≫ unrelated doc
    assert all(0 <= fp < WINNOW_MOD for fps in got.values() for fp in fps)
    # shorter than k chars → empty; short-but-valid → single global min
    tiny = spark.createDataFrame([(9, "ab"), (10, "abcdef")], "doc_id long, text string")
    tg = {r["doc_id"]: r["fp"] for r in tiny.select(
        "doc_id", winnowing_fingerprints(F.col("text")).alias("fp")).collect()}
    assert tg[9] == []
    assert len(tg[10]) == 1


def test_ivf_topk(emb):
    from prometheus_parquet_server_spark.pipeline.similarity import ivf_topk

    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    exact = {(r["probe_id"], r["neighbor_id"]): r["cosine"]
             for r in brute_force_topk(emb, probes, k=5).collect()}
    approx = ivf_topk(emb, probes, k=5, n_centroids=8, n_probe=4).collect()
    assert len(approx) > 0
    best_exact = {p: max(c for (pp, _), c in exact.items() if pp == p)
                  for p in {pp for pp, _ in exact}}
    for r in approx:
        assert r["cosine"] <= best_exact[r["probe_id"]] + 1e-9
    # recall sanity: with half the cells probed, expect >= 1 overlap per probe
    overlap = sum(1 for r in approx if (r["probe_id"], r["neighbor_id"]) in exact)
    assert overlap >= len(best_exact)


def test_multimodal_resize_and_frames(docs):
    from prometheus_parquet_server_spark.pipeline.multimodal import (
        resize_images,
        sample_frames,
    )

    media = media_frame_from_documents(docs.limit(20))
    resized = resize_images(media, width=16, height=4).collect()
    assert len(resized) == 20
    assert all(len(r["payload"]) == 64 for r in resized)
    assert all((r["width"], r["height"]) == (16, 4) for r in resized)

    frames = sample_frames(media, every_s=0.25, max_frames=4).collect()
    # duration defaults to 1s → 4 frames per media item
    assert len(frames) == 80
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 1, 2, 3] for v in by_media.values())


def test_connected_components_clusters(spark):
    from prometheus_parquet_server_spark.pipeline.clustering import (
        connected_components,
        duplicate_clusters,
    )

    # components: {1,2,3,4} (chain), {10,11}, singleton edges only
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    comp = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    clusters = {r["component"]: r for r in duplicate_clusters(pairs).collect()}
    assert clusters[1]["member_ids"] == [1, 2, 3, 4] and clusters[1]["keeper"] == 1
    assert clusters[10]["size"] == 2

    # long chain exercises the doubling propagation
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a long, id_b long"
    )
    comp = {r["node"]: r["component"] for r in connected_components(chain).collect()}
    assert set(comp.values()) == {0} and len(comp) == 31

    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(empty).count() == 0


def test_resolve_duplicates_quality_keep(spark):
    """Cluster {1,2,3} keeps the highest-score member (2); cluster {5,6}
    ties on score → lowest id (5); 4 is unclustered and survives; with
    score_col=None the lowest id wins everywhere."""
    from prometheus_parquet_server_spark.pipeline.clustering import (
        resolve_duplicates,
    )

    docs = spark.createDataFrame(
        [(1, 10.0), (2, 99.0), (3, 50.0), (4, 1.0), (5, 7.0), (6, 7.0)],
        "doc_id long, score double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    surv = {r["doc_id"] for r in resolve_duplicates(docs, pairs, score_col="score").collect()}
    assert surv == {2, 4, 5}
    surv_id = {r["doc_id"] for r in resolve_duplicates(docs, pairs).collect()}
    assert surv_id == {1, 4, 5}


def test_cross_doc_ngrams_detection(spark):
    """Shared 3-gram across two docs is found once; within-doc repeats
    count as occurrences, not extra docs; short docs produce no grams."""
    from prometheus_parquet_server_spark.pipeline.dedup import cross_doc_ngrams

    df = spark.createDataFrame(
        [
            (1, "the same span here tail one"),
            (2, "prefix the same span here"),
            (3, "the same span here and the same span here"),  # 2 occurrences
            (4, "too short"),
        ],
        "doc_id long, text string",
    )
    rows = cross_doc_ngrams(df, n=4).collect()
    by_docs = {(r["n_docs"], r["n_occ"]) for r in rows}
    # 'the same span here' appears in docs 1,2,3 with 4 total occurrences
    assert (3, 4) in by_docs
    import pytest as _pytest
    with _pytest.raises(ValueError):
        cross_doc_ngrams(df, n=0)


def test_connected_components_nonconvergence_raises(spark):
    """A path graph longer than the doubling horizon at a starved
    iteration budget must raise, never return silently-wrong components
    (a split cluster keeps extra duplicate copies at scale)."""
    from prometheus_parquet_server_spark.pipeline.clustering import (
        ConvergenceError,
        connected_components,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a long, id_b long"
    )
    # driver_edge_cap=0 forces the DISTRIBUTED propagation path — the
    # driver union-find fast path resolves any in-cap graph in one pass
    # and never exhausts an iteration budget
    with pytest.raises(ConvergenceError, match="fixpoint"):
        connected_components(chain, max_iterations=1, driver_edge_cap=0).collect()
    # the same graph converges with an adequate budget
    comp = connected_components(chain, max_iterations=10, driver_edge_cap=0)
    assert {r["component"] for r in comp.collect()} == {0}


def test_connected_components_driver_fast_path_matches_iterative(spark):
    """The size-guarded driver union-find (r14 optimization) must produce
    the IDENTICAL (node, component) labelling as the distributed doubling
    propagation — min-id components are algorithm-independent, and every
    graded row downstream of connected_components relies on that."""
    from prometheus_parquet_server_spark.pipeline.clustering import (
        connected_components,
    )

    # mixed shapes: chain, triangle+appendage, pair, self-contained star
    edges = (
        [(i, i + 1) for i in range(12)]           # chain 0..12
        + [(100, 101), (101, 102), (100, 102), (102, 103)]
        + [(200, 201)]
        + [(300, 301), (300, 302), (300, 303)]
    )
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    fast = {
        (r["node"], r["component"])
        for r in connected_components(pairs).collect()
    }
    iterative = {
        (r["node"], r["component"])
        for r in connected_components(pairs, driver_edge_cap=0).collect()
    }
    assert fast == iterative
    assert {c for _, c in fast} == {0, 100, 200, 300}
    # schema parity: downstream joins key on these exact names/types
    assert connected_components(pairs).schema.simpleString() == (
        "struct<node:bigint,component:bigint>"
    )


def test_capped_duplicate_id_lists(spark):
    """max_ids bounds member lists pre-aggregation (no unbounded
    collect_list buffer) while counts stay exact; a 100k-member
    pathological group engages the cap; capped output equals the
    truncated exact output on normal data."""
    from prometheus_parquet_server_spark.pipeline.clustering import (
        duplicate_clusters,
    )
    from prometheus_parquet_server_spark.pipeline.dedup import exact_duplicates

    # 100k identical docs + a 2-member group + a singleton
    big = spark.range(100_000).select(
        F.col("id").alias("doc_id"), F.lit("same boilerplate page").alias("text")
    )
    rest = spark.createDataFrame(
        [(200_000, "twin text"), (200_001, "twin text"), (300_000, "unique")],
        "doc_id long, text string",
    )
    docs = big.unionByName(rest)
    capped = {r["dup_count"]: r for r in exact_duplicates(docs, max_ids=5).collect()}
    assert set(capped) == {100_000, 2}
    assert capped[100_000]["doc_ids"] == [0, 1, 2, 3, 4]  # first 5 in id order
    assert capped[2]["doc_ids"] == [200_000, 200_001]

    # capped == exact truncated on ordinary data
    exact = {r["fp"]: r for r in exact_duplicates(rest).collect()}
    capped_rest = {r["fp"]: r for r in exact_duplicates(rest, max_ids=1).collect()}
    assert set(exact) == set(capped_rest)
    for fp, r in exact.items():
        assert capped_rest[fp]["dup_count"] == r["dup_count"]
        assert capped_rest[fp]["doc_ids"] == r["doc_ids"][:1]

    # duplicate_clusters: star component with 1000 members
    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 1000)] + [(5000, 5001)],
        "id_a long, id_b long",
    )
    cl = {r["component"]: r for r in duplicate_clusters(pairs, max_ids=3).collect()}
    assert cl[0]["size"] == 1000 and cl[0]["member_ids"] == [0, 1, 2]
    assert cl[5000]["size"] == 2 and cl[5000]["member_ids"] == [5000, 5001]
    with pytest.raises(ValueError):
        duplicate_clusters(pairs, max_ids=0)


def _png_chunks(width, height, ctype, raw):
    """Test-side PNG builder independent of encode_png: assemble chunks
    around an arbitrary pre-filtered raw stream."""
    import struct
    import zlib

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_roundtrip_all_filters():
    """encode_png -> decode_png recovers the exact pixels for None/Sub/Up
    filtered rows; Average and Paeth rows are forward-filtered BY THE TEST
    (independent spec-math derivation) and must unfilter back."""
    from prometheus_parquet_server_spark.pipeline.multimodal import (
        decode_image,
        decode_png,
        encode_png,
    )

    w, h = 5, 4
    pixels = bytes((x * 37 + 11) % 256 for x in range(w * h * 3))
    # filters 0 (None), 1 (Sub), 2 (Up) via the module encoder
    png = encode_png(w, h, pixels, filters=bytes([0, 1, 2, 1]))
    assert decode_png(png) == (w, h, pixels)
    out = decode_image(png)
    assert out is not None and (out["width"], out["height"]) == (w, h)

    # filters 3 (Average) and 4 (Paeth): forward-filter in the test
    row = w * 3
    raw = bytearray()
    prev = bytes(row)
    for y, f in enumerate([0, 3, 4, 3]):
        line = pixels[y * row : (y + 1) * row]
        stored = bytearray(line)
        if f == 3:
            for i in range(row):
                a = line[i - 3] if i >= 3 else 0
                stored[i] = (line[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:
            for i in range(row):
                a = line[i - 3] if i >= 3 else 0
                b = prev[i]
                c = prev[i - 3] if i >= 3 else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                stored[i] = (line[i] - pred) & 0xFF
        raw.append(f)
        raw += stored
        prev = line
    png34 = _png_chunks(w, h, 2, bytes(raw))
    assert decode_png(png34) == (w, h, pixels)


def test_png_rgba_and_subset_rejection():
    """Color type 6 decodes with alpha dropped; out-of-subset PNGs
    (grayscale, 16-bit) return None and fall to the stub path."""
    import struct

    from prometheus_parquet_server_spark.pipeline.multimodal import decode_png

    w, h = 3, 2
    rgb = bytes(range(w * h * 3))
    rgba = bytearray()
    for i in range(w * h):
        rgba += rgb[3 * i : 3 * i + 3] + b"\xaa"
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw += rgba[y * w * 4 : (y + 1) * w * 4]
    assert decode_png(_png_chunks(w, h, 6, bytes(raw))) == (w, h, rgb)

    # grayscale (ctype 0) → None
    gray_raw = b"\x00" + bytes(w)
    assert decode_png(_png_chunks(w, 1, 0, gray_raw)) is None
    assert decode_png(b"not a png") is None


def test_png_through_feature_extraction(spark):
    """A PNG payload must take the REAL decode path in extract_features
    (feature == decode_image's, not the md5 stub)."""
    from prometheus_parquet_server_spark.pipeline.multimodal import (
        MEDIA_SCHEMA,
        _stub_feature,
        decode_image,
        encode_png,
        extract_features,
    )

    w, h = 8, 8
    png = encode_png(w, h, bytes((x * 7) % 256 for x in range(w * h * 3)))
    media = spark.createDataFrame(
        [(1, "image", png, ("image/png", w, h, None))],
        MEDIA_SCHEMA,
    )
    row = extract_features(media).collect()[0]
    want = decode_image(png)["feature"]
    assert list(row["feature"]) == pytest.approx(want)
    assert list(row["feature"]) != pytest.approx(_stub_feature(png))

    from prometheus_parquet_server_spark.pipeline.multimodal import resize_images

    rrow = resize_images(media, width=4, height=4).collect()[0]
    assert rrow["decoder"] == "real" and len(rrow["payload"]) > 0


def test_png_crc_rejection():
    """A PNG whose chunk bytes are corrupted (CRC mismatch) must be
    rejected, not decoded into garbage with decoder='real'."""
    from prometheus_parquet_server_spark.pipeline.multimodal import (
        decode_png,
        encode_png,
    )

    png = bytearray(encode_png(4, 4, bytes(range(48))))
    assert decode_png(bytes(png)) is not None
    # flip one byte inside the IDAT body (after sig+IHDR: 8+25=33, IDAT
    # data starts at 33+8)
    png[45] ^= 0xFF
    assert decode_png(bytes(png)) is None


def test_hash_embed_composes_with_cosine_topk(spark):
    """hash_embed: identical texts → identical unit vectors (cosine 1 via
    brute_force_topk); empty docs → zero vector; unit norm for nonempty;
    dim validation."""
    from prometheus_parquet_server_spark.pipeline.similarity import (
        brute_force_topk,
        hash_embed,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "the quick brown fox jumps"),   # exact dup of 1
            (3, "entirely different words here about spark engines"),
            (4, ""),                            # no tokens → zero vector
        ],
        "doc_id long, text string",
    )
    emb = hash_embed(docs, dim=32).cache()
    rows = {r["doc_id"]: list(r["embedding"]) for r in emb.collect()}
    assert rows[1] == rows[2]
    assert rows[4] == [0.0] * 32
    assert abs(sum(x * x for x in rows[1]) - 1.0) < 1e-9  # unit norm
    assert rows[1] != rows[3]

    probes = emb.filter(F.col("doc_id") == 1).select(
        F.col("doc_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    corpus = emb.select(F.col("doc_id").alias("vec_id"), "embedding")
    top = brute_force_topk(corpus, probes, k=1).collect()
    assert top[0]["neighbor_id"] == 2 and top[0]["cosine"] == 1.0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="dim"):
        hash_embed(docs, dim=0)


def test_semantic_dedup_drops_in_cell_near_dups_keeps_lowest_id(spark):
    """SemDeDup policy: a planted group of (near-)identical vectors lands
    in one cell; only the lowest id survives. An orthogonal vector in a
    different cell is untouched. iterations=0 → centroids are the lowest-
    id vectors, so the planted geometry is fully deterministic."""
    from prometheus_parquet_server_spark.pipeline.similarity import semantic_dedup

    dim = 4
    e1 = [1.0, 0.0, 0.0, 0.0]
    e2 = [0.0, 1.0, 0.0, 0.0]
    near = [0.999, 0.01, 0.0, 0.0]  # cos with e1 ≈ 0.99995
    rows = [(0, e1), (1, e2), (2, near), (3, near), (4, [0.0, 0.99, 0.1, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(
        df, threshold=0.95, n_centroids=2, kmeans_iterations=0, dim=dim
    )
    got = {r["vec_id"]: (r["cell"], r["kept"]) for r in out.collect()}
    assert len(got) == 5
    # e1-cell: 0 kept; 2 and 3 are dup of 0 (and of each other) → dropped
    assert got[0][1] is True
    assert got[2][1] is False and got[3][1] is False
    assert got[2][0] == got[0][0] == got[3][0]
    # e2-cell: 1 kept; 4 has cos≈0.995 with 1 → dropped at τ=0.95
    assert got[1][1] is True and got[4][1] is False
    assert got[4][0] == got[1][0]


def test_semantic_dedup_max_cell_excludes_big_cells_from_pairing(spark):
    from prometheus_parquet_server_spark.pipeline.similarity import semantic_dedup

    # 6 identical vectors → one cell of 6; with max_cell=4 the cell is
    # never paired, so ALL are conservatively kept
    rows = [(i, [1.0, 0.0]) for i in range(6)] + [(10, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(
        df, threshold=0.9, n_centroids=2, kmeans_iterations=0, dim=2, max_cell=4
    )
    kept = {r["vec_id"] for r in out.collect() if r["kept"]}
    assert kept == {0, 1, 2, 3, 4, 5, 10}
    # without the cap, only the lowest id of the big cell survives
    out2 = semantic_dedup(
        df, threshold=0.9, n_centroids=2, kmeans_iterations=0, dim=2
    )
    kept2 = {r["vec_id"] for r in out2.collect() if r["kept"]}
    assert kept2 == {0, 10}


# ---------------------------------------------------------------------------
# Line-level boilerplate dedup + rule flags (pipeline/lines.py)
# ---------------------------------------------------------------------------


def test_strip_boilerplate_lines(spark):
    from prometheus_parquet_server_spark.pipeline.lines import (
        frequent_lines,
        strip_boilerplate_lines,
    )

    docs = spark.createDataFrame(
        [
            (1, "real content one\nACCEPT COOKIES\nmore text"),
            (2, "other words\nACCEPT COOKIES"),
            (3, "ACCEPT COOKIES\nthird body"),
            (4, "no banner here\n\n  \njust prose"),
        ],
        "doc_id long, text string",
    )
    freq = frequent_lines(docs, min_docs=3).collect()
    assert len(freq) == 1 and freq[0]["n_docs"] == 3
    out = {
        r["doc_id"]: r["clean_text"]
        for r in strip_boilerplate_lines(docs, min_docs=3).collect()
    }
    assert out[1] == "real content one\nmore text"
    assert out[2] == "other words"
    assert out[3] == "third body"
    # untouched docs round-trip BYTE-IDENTICAL: blank lines and
    # indentation survive; only matched boilerplate lines are removed
    assert out[4] == "no banner here\n\n  \njust prose"
    # a line repeated WITHIN one doc doesn't fake corpus boilerplate
    intra = spark.createDataFrame(
        [(1, "dup\ndup\ndup"), (2, "x")], "doc_id long, text string"
    )
    assert frequent_lines(intra, min_docs=2).count() == 0
    assert (
        strip_boilerplate_lines(intra, min_docs=2)
        .filter(F.col("doc_id") == 1)
        .first()["clean_text"]
        == "dup\ndup\ndup"
    )
    # CRLF and trailing-whitespace variants normalize to ONE line
    # identity for matching, but surviving lines keep their bytes
    crlf = spark.createDataFrame(
        [
            (1, "BANNER\r\nkeep a"),
            (2, "BANNER \nkeep b"),
            (3, "\tBANNER\nkeep c"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["clean_text"]
        for r in strip_boilerplate_lines(crlf, min_docs=3).collect()
    }
    assert out == {1: "keep a", 2: "keep b", 3: "keep c"}


def test_rule_flags_golden(spark):
    from prometheus_parquet_server_spark.pipeline.lines import rule_flags

    cases = [
        (1, "short"),  # 1 token → too_short, low_alpha False (has letters)
        (2, "- a\n- b\n- c\n- d\n- e\n- f\n- g\n- h\n- i\n- j"),  # bullets
        (3, "wait...\nhm…\nok"),  # 2/3 ellipsis lines > 0.3
        (4, "1 2 3 4 5 6 7 8 9 10"),  # numeric → low_alpha
        (5, "plain healthy prose with many normal readable words here ok"),
    ]
    df = spark.createDataFrame(cases, "doc_id long, text string")
    flags = rule_flags(F.col("text"))
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", *[c.alias(n) for n, c in flags.items()]
        ).collect()
    }
    assert rows[1]["flag_too_short"] and not rows[1]["flag_low_alpha"]
    assert rows[2]["flag_bullet_heavy"]
    assert rows[3]["flag_ellipsis_heavy"]
    assert rows[4]["flag_low_alpha"]
    r5 = rows[5]
    assert not any(
        r5[k]
        for k in (
            "flag_too_short",
            "flag_too_long",
            "flag_symbol_heavy",
            "flag_bullet_heavy",
            "flag_ellipsis_heavy",
            "flag_low_alpha",
        )
    )


def test_repeated_span_fraction(spark):
    from prometheus_parquet_server_spark.pipeline.dedup import (
        repeated_span_fraction,
    )

    shared = "a b c d"  # the 4-gram every doc shares
    docs = spark.createDataFrame(
        [
            (1, f"{shared} unique one two three"),
            (2, f"other words here {shared}"),
            (3, "entirely different body of text"),
            (4, "tiny"),  # < n tokens → zero grams, frac 0.0
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_grams"], r["n_repeated"], r["repeated_frac"])
        for r in repeated_span_fraction(docs, n=4, min_docs=2).collect()
    }
    # doc 1: 8 toks → 5 grams, 1 repeated; doc 2: 7 toks → 4 grams, 1 rep
    assert out[1] == (5, 1, 1 / 5)
    assert out[2] == (4, 1, 1 / 4)
    assert out[3] == (2, 0, 0.0)
    assert out[4] == (0, 0, 0.0)
    with pytest.raises(ValueError, match=">= 1"):
        repeated_span_fraction(docs, n=0)


def test_remove_repeated_spans(spark):
    from prometheus_parquet_server_spark.pipeline.dedup import (
        remove_repeated_spans,
    )

    boiler = "q w e r"  # the shared 4-gram to excise
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {boiler} gamma delta"),
            (2, f"{boiler} start of doc two"),
            (3, f"ending with it {boiler}"),
            (4, "none of that here at all"),
            (5, "tiny"),  # < n tokens → unchanged (normalized)
            (6, f"{boiler} {boiler} doubled"),  # overlapping coverage
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["clean_text"]
        for r in remove_repeated_spans(docs, n=4, min_docs=3).collect()
    }
    assert out[1] == "alpha beta gamma delta"
    assert out[2] == "start of doc two"
    assert out[3] == "ending with it"
    assert out[4] == "none of that here at all"
    assert out[5] == "tiny"
    assert out[6] == "doubled"
    # overlapping-span coverage: doc 6's repeated grams include the
    # straddling windows ('r q w e' etc. never repeat, but 'q w e r' at
    # positions 0 and 4 both hit, and the merge keeps deletion contiguous)


def test_simhash_bits_validated(spark):
    from prometheus_parquet_server_spark.pipeline.dedup import simhash

    df = spark.createDataFrame([("hello world",)], "text string")
    assert len(df.select(simhash(F.col("text"), bits=32)).first()[0]) == 32
    with pytest.raises(ValueError, match=r"\[1, 32\]"):
        simhash(F.col("text"), bits=64)
    with pytest.raises(ValueError, match=r"\[1, 32\]"):
        simhash(F.col("text"), bits=0)


def test_banding_stages_shingles_once(spark):
    """The LSH banding preamble must materialize the shingle tree ONCE
    per row: the inline form re-evaluates it num_perm x bands times in
    interpreted HOFs (the measured winnowing blowup class; fixing it cut
    wide-shape banding 19.9s -> 6.2s at sf0.1). Pinned by counting
    tokenizer splits in the physical plan — and the staged form must be
    row-identical to the Column-API composition."""
    from prometheus_parquet_server_spark.pipeline.dedup import (
        _banded,
        minhash_bands,
        minhash_signature,
        tokens_col,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma {i} delta epsilon") for i in range(30)],
        "doc_id long, text string",
    )
    staged = _banded(docs, "text", "doc_id", 16, 4, 2)
    plan = staged._jdf.queryExecution().executedPlan().toString()
    # the r14 explode+aggregate signature shape mentions the tokenizer a
    # few more times across operator descriptions (filter + explode +
    # staging projections) but still evaluates it once per row — the
    # inline form this guards against embeds it ~num_perm x bands ≈ 112
    # times and re-runs it per reference
    assert plan.count("split(") <= 20
    api = docs.filter(F.size(tokens_col(F.col("text"))) > 0).select(
        "doc_id",
        F.explode(
            minhash_bands(minhash_signature(F.col("text"), 16, 2), 4, 4)
        ).alias("band_key"),
    )
    assert staged.exceptAll(api).count() == 0
    assert api.exceptAll(staged).count() == 0


def test_edit_distance_pairs_byte_contract_and_threshold(spark):
    """edit_distance_pairs (round 12): distances equal a pure-Python
    byte-level Levenshtein reference (the latin-1 view makes Spark's
    codepoint kernel count UTF-8 BYTES — the convention DuckDB's native
    levenshtein already uses, so the oracle replays it directly);
    above-threshold pairs drop via the -1 sentinel; byte lengths are the
    raw UTF-8 octet counts; NULL text is zero bytes."""
    from prometheus_parquet_server_spark.pipeline.dedup import (
        edit_distance_pairs,
    )

    rows = [
        (1, "hello world"),
        (2, "hello w0rld"),          # 1 byte edit
        (3, "Ünïcödé body"),         # multi-byte chars
        (4, "Unicode body"),
        (5, None),                   # NULL text → 0 bytes
        (6, ""),
        (7, "completely different text that is far away from all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6), (1, 7)], "id_a long, id_b long"
    )

    def lev(a, b):
        a, b = (a or "").encode(), (b or "").encode()
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    out = {(r["id_a"], r["id_b"]): (r["dist"], r["bytes_a"], r["bytes_b"])
           for r in edit_distance_pairs(docs, pairs, max_dist=30).collect()}
    texts = dict(rows)
    # kept pairs: exact byte distance + raw octet lengths
    for (a, b), (d, la, lb) in out.items():
        assert d == lev(texts[a], texts[b]), (a, b)
        assert la == len((texts[a] or "").encode())
        assert lb == len((texts[b] or "").encode())
    assert (1, 2) in out and out[(1, 2)][0] == 1
    assert (3, 4) in out and out[(3, 4)][0] == lev(texts[3], texts[4]) > 2
    assert (5, 6) in out and out[(5, 6)] == (0, 0, 0)
    # far pair exceeds the threshold: dropped, not emitted with -1
    assert (1, 7) not in out
    assert lev(texts[1], texts[7]) > 30
    with pytest.raises(ValueError, match="max_dist"):
        edit_distance_pairs(docs, pairs, max_dist=-1)
