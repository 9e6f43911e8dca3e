"""Registry invariants: the correctness driver grades only the FIRST 50
entries of ``QUERIES``, so every scale-path family must either sit inside
the graded window or hold a RECORDED driver-green from a prior round's
window (rotation — the accepted mechanism since round 10: a driver-green
row may demote to the locally-checked tail to free a graded slot). A
careless insertion must fail here, not silently push a never-graded
scale-path query past the cutoff (which left the similarity/ANN/
multimodal/streaming paths ungraded for rounds 2-4)."""

import glob
import json
import os
import re

from prometheus_parquet_server_spark.driver_contract import ORACLES, QUERIES

GRADED_WINDOW = 50

#: families that must stay driver-observed: inside the graded window, or
#: already green in a recorded CORRECTNESS_r*.json window
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

_REPO = os.path.join(os.path.dirname(__file__), "..")


#: a recorded green stays valid for this many correctness rounds
#: (inclusive of the round it was recorded in) — the ADVICE r13 fix for
#: the unbounded name-keyed green: a scale-path row rewritten after its
#: green can no longer stay satisfied forever; it must re-enter the
#: graded window within the freshness horizon. 4 rounds keeps the
#: re-rotation cost at ~len(SCALE_PATHS)/4 slots per round.
GREEN_MAX_AGE_ROUNDS = 4


def _driver_green() -> set[str]:
    """Row names recorded fully green (rows+schema+hash) in a RECENT
    round's driver correctness file — "recent" meaning within
    GREEN_MAX_AGE_ROUNDS of the newest CORRECTNESS_r*.json present.

    Greens are still keyed by NAME (we have no historical content
    hashes), but the max-age bounds the staleness: a rewritten or
    demoted scale-path row re-enters the graded window within the
    horizon or this invariant fails. The bit-exact defense for tail
    rows remains the strict local gate (scripts/check_oracles.py),
    which checks CURRENT code against CURRENT oracles every round."""
    by_round: dict[int, dict] = {}
    for path in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            by_round[int(m.group(1))] = json.load(open(path))
        except (OSError, ValueError):
            continue
    if not by_round:
        return set()
    horizon = max(by_round) - (GREEN_MAX_AGE_ROUNDS - 1)
    green: set[str] = set()
    for rnd, rows in by_round.items():
        if rnd < horizon:
            continue
        for name, v in rows.items():
            if (
                isinstance(v, dict)
                and v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match")
            ):
                green.add(name)
    return green


def test_scale_paths_graded_or_recorded_green():
    graded = set(list(QUERIES)[:GRADED_WINDOW])
    ok = graded | _driver_green()
    missing = [n for n in SCALE_PATHS if n not in ok]
    assert not missing, (
        f"scale paths neither in the graded window nor driver-green on "
        f"record: {missing}"
    )


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


def test_graded_window_queries_all_have_oracles():
    # every graded entry is value-checked (streaming included since r5)
    graded = list(QUERIES)[:GRADED_WINDOW]
    unchecked = [n for n in graded if n not in ORACLES]
    assert unchecked == [], f"graded entries without oracles: {unchecked}"
