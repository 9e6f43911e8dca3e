"""Registry invariants: the correctness driver grades only the FIRST 50
entries of ``QUERIES``, so the graded window must keep every scale-path
family — a careless insertion must fail here, not silently push a query
past the cutoff (which left the similarity/ANN/multimodal/streaming paths
ungraded for rounds 2-4)."""

from prometheus_parquet_server_spark.driver_contract import ORACLES, QUERIES

GRADED_WINDOW = 50

#: families that must stay inside the graded window
SCALE_PATHS = [
    "dedup_exact_fp",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_embedding",
    "dedup_clusters",
    "emb_cosine_topk",
    "ann_lsh_topk",
    "ivf_topk",
    "text_quality",
    "text_langid",
    "text_token_count",
    "text_winnowing",
    "multimodal_meta",
    "multimodal_decode",
    "streaming_event_counts",
    "pipeline_prepare",
]


def test_graded_window_contains_scale_paths():
    graded = list(QUERIES)[:GRADED_WINDOW]
    missing = [n for n in SCALE_PATHS if n not in graded]
    assert not missing, f"scale paths pushed out of the graded window: {missing}"


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


def test_graded_window_queries_all_have_oracles():
    # every graded entry is value-checked (streaming included since r5)
    graded = list(QUERIES)[:GRADED_WINDOW]
    unchecked = [n for n in graded if n not in ORACLES]
    assert unchecked == [], f"graded entries without oracles: {unchecked}"
