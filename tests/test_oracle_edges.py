"""Oracle parity on an ADVERSARIAL corpus.

The driver's correctness gate runs every query/oracle pair over the
synthetic testdata — clean prose, no NULLs, LF newlines, mostly ASCII.
A Spark/DuckDB divergence that only bites on dirty input (NULL text,
CRLF, whitespace-only docs, non-Latin scripts, exact duplicates) would
sail through that gate. This suite materializes an edge corpus as a
real documents.parquet and replays selected curation rows through BOTH
engines with the driver's own comparison normalization.
"""

import math

import duckdb
import pytest
from pyspark.sql import functions as F  # noqa: F401  (parity with harness)

from prometheus_parquet_server_spark.driver_contract import ORACLES, QUERIES

EDGE_ROWS = [
    # (doc_id, text, lang, source, n_chars)
    (1, "", "en", "src0", 0),
    (2, None, "en", "src0", 0),
    (3, "ACCEPT ALL COOKIES\r\nreal crlf body line\r\nmore text", "en", "src1", 50),
    (4, "Ünïcödé Привет мир 你好 world prose tokens here extra", "ru", "src1", 52),
    (5, "   \n\t\n  ", "en", "src2", 8),
    (6, "identical duplicated body of text right here", "en", "src2", 45),
    (7, "identical duplicated body of text right here", "en", "src2", 45),
    (8, "identical duplicated body of text right here", "en", "src0", 45),
    (9, "a b a b a b a b a b a b a b a b a b a b", "en", "src0", 39),
    (10, "x" * 50 + " yy zz qq ww ee", "en", "src1", 65),
    (11, "- bullet one\n- bullet two\n- bullet three", "en", "src2", 40),
    (12, "trailing ellipsis line...\nanother one…\nplain", "en", "src0", 44),
    # carries the graded BM25 query terms through dirty framing (CRLF,
    # repeated terms, mixed case) so bm25_topk scores real matches here
    (13, "HASH join\r\nhash FAST stream\r\nwindow window join", "en", "src1", 48),
]

# rows whose Spark and DuckDB sides must agree on the edge corpus; each
# is individually graded on the clean corpus already — this pins the
# DIRTY-input behavior both sides share
EDGE_QUERIES = [
    "pipeline_line_dedup",
    "text_rule_flags",
    "text_repeated_spans",
    "text_remove_spans",
    "pipeline_shuffle",
    "pipeline_prepare_v3",
    "pipeline_prepare_v4",
    "dedup_exact_fp",
    "text_quality",
    "text_langid",
    "text_token_count",
    "text_hash_embed",
    "text_winnowing",
    "dedup_shared_ngrams",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_jaccard",
    "dedup_edit",
    "dedup_minhash_incremental",
    "pipeline_capped_sample",
    "pipeline_stratified",
    "vocab_topk",
    "tfidf_topk",
    "bm25_topk",
    "pipeline_chunks",
    "text_repetition",
    "pipeline_split",
    "pipeline_contamination",
    "pipeline_packing",
    "pipeline_token_budget",
    "pipeline_mixture",
    "jsonl_ingest",
    "cluster_topics",
    "hybrid_combmnz_topk",
    "corpus_stats",
    "text_perplexity",
    "dedup_survivors",
    "dedup_clusters",
    "dedup_shared_ngrams",
    "pipeline_pii_scrub",
    "pipeline_strip_markup",
    "pipeline_curriculum",
]


def _write_single_parquet(df, path):
    """Write a Spark frame as ONE parquet FILE (the driver's testdata
    layout — a file named <table>.parquet, not a directory): the
    streaming source's pathGlobFilter matches leaf file names, so a
    directory-shaped fixture would stream nothing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.Table.from_pandas(df.toPandas())
    # pandas hands back ns timestamps, which the engine session reads as
    # LONG (nanosAsLong) — the driver's testdata is timestamp[us]
    for i, f in enumerate(t.schema):
        if pa.types.is_timestamp(f.type) and f.type.unit != "us":
            t = t.set_column(
                i, f.name, t.column(i).cast(pa.timestamp("us"))
            )
    pq.write_table(t, path)


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    return str(v)


def _norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        "|".join(_norm_cell(row[i]) for i in idx) for row in rows
    )


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_sf")
    docs = spark.createDataFrame(
        EDGE_ROWS,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    _write_single_parquet(docs, f"{d}/documents.parquet")
    # dedup_survivors/clusters join quality scores against embeddings
    emb = spark.createDataFrame(
        [(i, [float((i * 31 + j) % 7 - 3) for j in range(64)], i % 2)
         for i, _t, _l, _s, _n in EDGE_ROWS],
        "vec_id bigint, embedding array<float>, label int",
    )
    _write_single_parquet(emb, f"{d}/embeddings.parquet")
    return str(d)


@pytest.fixture(scope="module")
def duck(edge_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{edge_dir}/documents.parquet')"
    )
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{edge_dir}/embeddings.parquet')"
    )
    return con


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_edge_corpus_parity(spark, edge_dir, duck, name):
    sdf = QUERIES[name](spark, edge_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(ORACLES[name])
    ocols = [c[0] for c in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows), f"{name}: {len(srows)} vs {len(orows)}"
    assert _norm_rows(scols, srows) == _norm_rows(ocols, orows), name


# ---------------------------------------------------------------------------
# Events-table rows over an adversarial events fixture
# ---------------------------------------------------------------------------

import datetime as _dt

_T0 = _dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(s):
    return _T0 + _dt.timedelta(seconds=s)


EDGE_EVENTS = [
    # (event_id, ts, user_id, event_type, value, props)
    (1, _ts(0), 1, "click", 1.0, "{}"),
    (2, _ts(0), 1, "click", 2.0, "{}"),      # duplicate (user, ts)
    (3, _ts(10), 1, "purchase", 5.0, None),  # NULL props
    (4, _ts(20), None, "click", 3.0, "{}"),  # NULL user
    (5, _ts(30), 2, "view", None, "{}"),     # NULL value
    (6, _ts(40), 2, "click", -1.5, "{}"),    # negative value
    (7, _ts(4000), 2, "click", 7.0, "{}"),   # big session gap
    (8, _ts(4001), 3, "purchase", 0.0, "{}"),
    (9, _ts(4001), 3, "purchase", 0.0, "{}"),  # exact duplicate row
    # NULL ts (round 12, VERDICT r11 Next #1/#3): the one dirty-data class
    # the r6–r11 suite missed. Engines disagree on NULL sort placement
    # (Spark windows ASC NULLS FIRST, DuckDB NULLS LAST), so any
    # ordering-sensitive operator without an explicit NULL-ts contract
    # diverges at identical row counts. User 2 has events in TWO sessions
    # — the adversarial shape where membership moves between first/last.
    (10, None, 2, "click", 4.0, "{}"),
    (11, None, 4, "view", 1.0, "{}"),        # NULL ts, user with no other rows
]

EDGE_EVENT_QUERIES = [
    "events_asof_join",
    "events_sessionize",
    "events_rollup",
    "events_range_join",
    "events_props_json",
    # the PromQL metrics stack derives its canonical table from events
    "f1_selector",
    "f3_name_index",
    "t3_resample",
    "p1_rate",
    "p2_irate",
    "a1_sum_by",
    "promql_sum_rate",
    "m2_metric_names",
    "m3_series_count",
    "p2_irate",
    "p3_histogram_quantile",
    "hq_sum_rate",
    "a2_sum_without",
    "a3_sum_bare",
    "a4_multi_agg",
    "promql_binop",
    "promql_topk",
    "promql_quantile",
    "promql_over_time",
    "promql_cmp_filter",
    "promql_count_values",
    "t5_offset",
    "promql_increase",
    "promql_changes",
    # hot-key chunked twins: carry-in seeds under adversarial data must
    # match their uniform twins' shared oracles bit-for-bit
    "events_asof_chunked",
    "events_sessionize_chunked",
    "t3_resample_chunked",
    "p2_irate_chunked",
    "streaming_event_counts",
    "snapshot_stats_events",
    "snapshot_delete_events",
    "promql_holt_winters",
    "promql_deriv",
    "promql_mad_ot",
    "promql_last_over_time",
    "promql_quantile_ot",
    "promql_present_ot",
    "promql_group",
    "promql_date_parts",
    "promql_idelta",
    "promql_time_arith",
    "promql_set_unless",
    "promql_at_modifier",
    "promql_count_values",
    # round-12 NULL-sort-key audit (VERDICT r11 Next #3): every remaining
    # ordering-sensitive oracle pair now faces the NULL-ts fixture rows
    "events_sessionize_int",
    "events_sessionize_floats",
    "events_sessionize_md5",
    "events_sessionize_native",
    "snapshot_update_events",
    "snapshot_diff_events",
    "rollup_incremental",
    "streaming_interval_join",
    "promql_subquery",
    "promql_absent",
]


@pytest.fixture(scope="module")
def edge_events_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_ev")
    ev = spark.createDataFrame(
        EDGE_EVENTS,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    _write_single_parquet(ev, f"{d}/events.parquet")
    return str(d)


@pytest.fixture(scope="module")
def duck_events(edge_events_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{edge_events_dir}/events.parquet')"
    )
    return con


@pytest.mark.parametrize("name", EDGE_EVENT_QUERIES)
def test_edge_events_parity(spark, edge_events_dir, duck_events, name):
    sdf = QUERIES[name](spark, edge_events_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck_events.execute(ORACLES[name])
    ocols = [c[0] for c in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows), f"{name}: {len(srows)} vs {len(orows)}"
    assert _norm_rows(scols, srows) == _norm_rows(ocols, orows), name


# ---------------------------------------------------------------------------
# Embeddings-table rows over an adversarial embeddings fixture
# ---------------------------------------------------------------------------

_D = 64  # the graded ANN geometry pins dim-64 planes (_ND_DIM)


def _vec(seed):
    return [float((seed * 31 + j) % 7 - 3) for j in range(_D)]


EDGE_EMBEDDINGS = (
    [(1, [0.0] * _D, 0)]                      # zero vector (undefined cosine)
    + [(2, _vec(5), 1), (3, _vec(5), 1)]      # exact duplicate vectors
    + [(4, [1e30] * _D, 0)]                   # huge magnitudes
    + [(5, [1e-30] * _D, 1)]                  # tiny magnitudes
    + [(i, _vec(i), i % 2) for i in range(6, 40)]
)

EDGE_EMB_QUERIES = ["emb_cosine_topk", "dedup_embedding", "sq8_store_topk"]


@pytest.fixture(scope="module")
def edge_emb_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_emb")
    emb = spark.createDataFrame(
        EDGE_EMBEDDINGS, "vec_id bigint, embedding array<float>, label int"
    )
    _write_single_parquet(emb, f"{d}/embeddings.parquet")
    return str(d)


@pytest.fixture(scope="module")
def duck_emb(edge_emb_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{edge_emb_dir}/embeddings.parquet')"
    )
    return con


@pytest.mark.parametrize("name", EDGE_EMB_QUERIES)
def test_edge_embeddings_parity(spark, edge_emb_dir, duck_emb, name):
    sdf = QUERIES[name](spark, edge_emb_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck_emb.execute(ORACLES[name])
    ocols = [c[0] for c in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows), f"{name}: {len(srows)} vs {len(orows)}"
    assert _norm_rows(scols, srows) == _norm_rows(ocols, orows), name


# ---------------------------------------------------------------------------
# TPC-H rows over adversarial relational fixtures (NULL join keys,
# orphan foreign keys, NULL measures, duplicate keys)
# ---------------------------------------------------------------------------

EDGE_TPCH = {
    "region": (
        [(0, "AMERICA"), (1, "ASIA"), (2, None)],
        "r_regionkey bigint, r_name string",
    ),
    "nation": (
        [(0, "US", 0), (1, "JP", 1), (2, "XX", None), (3, None, 0)],
        "n_nationkey bigint, n_name string, n_regionkey bigint",
    ),
    "customer": (
        [
            (1, "alice", 0, 10.0, "BUILDING"),
            (2, "bob", 1, -5.0, "AUTOMOBILE"),
            (3, "carol", None, 0.0, None),     # NULL nation + segment
            (4, "dave", 99, 1.0, "BUILDING"),  # orphan nation key
        ],
        "c_custkey bigint, c_name string, c_nationkey bigint, "
        "c_acctbal double, c_mktsegment string",
    ),
    "supplier": (
        [(1, "s1", 0, 1.0), (2, "s2", None, 2.0)],
        "s_suppkey bigint, s_name string, s_nationkey bigint, s_acctbal double",
    ),
    "part": (
        [(1, "widget", "B1", "SMALL", 1, 9.99), (2, None, "B2", None, 2, 0.0)],
        "p_partkey bigint, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ),
    "orders": (
        [
            (10, 1, "O", 100.0, _ts(0), "1-URGENT"),
            (11, 2, "F", 200.0, _ts(86400), "2-HIGH"),
            (12, None, "O", 50.0, _ts(2 * 86400), "3-MEDIUM"),  # NULL cust
            (13, 99, "F", None, _ts(3 * 86400), "4-LOW"),  # orphan + NULL price
        ],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ),
    "lineitem": (
        [
            (10, 1, 1, 1, 2.0, 100.0, 0.1, 0.05, "N", "O", _ts(0)),
            (10, 2, 2, 2, 1.0, 50.0, 0.0, 0.0, "R", "F", _ts(3600)),
            (11, 1, 1, 1, None, 75.0, 0.2, 0.1, "A", "F", _ts(86400)),  # NULL qty
            (12, 2, 2, 1, 3.0, None, 0.1, 0.0, "N", "O", _ts(2 * 86400)),  # NULL price
            (99, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", _ts(0)),  # orphan order
            (13, None, None, 1, 4.0, 40.0, 0.5, 0.2, "R", "F", _ts(3 * 86400)),
        ],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    ),
}

EDGE_TPCH_QUERIES = ["tpch_q1", "tpch_q3", "tpch_q5ish"]


@pytest.fixture(scope="module")
def edge_tpch_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_tpch")
    for t, (rows, schema) in EDGE_TPCH.items():
        _write_single_parquet(
            spark.createDataFrame(rows, schema), f"{d}/{t}.parquet"
        )
    return str(d)


@pytest.fixture(scope="module")
def duck_tpch(edge_tpch_dir):
    con = duckdb.connect()
    for t in EDGE_TPCH:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{edge_tpch_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", EDGE_TPCH_QUERIES)
def test_edge_tpch_parity(spark, edge_tpch_dir, duck_tpch, name):
    sdf = QUERIES[name](spark, edge_tpch_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck_tpch.execute(ORACLES[name])
    ocols = [c[0] for c in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows), f"{name}: {len(srows)} vs {len(orows)}"
    assert _norm_rows(scols, srows) == _norm_rows(ocols, orows), name


# ---------------------------------------------------------------------------
# NULL sort-key divergence mechanism (round 12, VERDICT r11 Next #1)
# ---------------------------------------------------------------------------
# Spark windows order ASC NULLS FIRST; DuckDB orders ASC NULLS LAST. Over a
# LAG-gap sessionize this moves a NULL-ts event between a user's FIRST and
# LAST session at identical row/session counts — rows_match green,
# hash_match red, the exact CORRECTNESS_r11 signature. Part A pins the
# mechanism on the UNGUARDED forms (they must diverge); part B proves the
# shipped NULL-ts contract (drop on both engines) restores bit parity.

_NULLTS_ROWS = [(1, None, 9.0), (1, 10.0, 1.0), (1, 2000.0, 2.0), (1, 6000.0, 4.0)]


def _nullts_duck(guard: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW base AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({u}, {('CAST(NULL AS DOUBLE)' if t is None else t)}, {v})"
            for u, t, v in _NULLTS_ROWS
        )
        + ") AS t(user_id, ts_s, value)"
    )
    return con.execute(
        f"""
        WITH flagged AS (
            SELECT user_id, ts_s, value,
                   CASE WHEN ts_s - LAG(ts_s) OVER
                        (PARTITION BY user_id ORDER BY ts_s) > 1800.0
                        THEN 1 ELSE 0 END AS new_flag
            FROM base {guard}
        ),
        numbered AS (
            SELECT user_id, ts_s, value,
                   SUM(new_flag) OVER (PARTITION BY user_id ORDER BY ts_s
                       ROWS UNBOUNDED PRECEDING) + 1 AS session_seq
            FROM flagged
        )
        SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
               MIN(ts_s) AS session_start, MAX(ts_s) AS session_end,
               COUNT(*) AS n_events, SUM(value) AS sum_value
        FROM numbered GROUP BY user_id, session_seq
        ORDER BY user_id, session_seq
        """
    ).fetchall()


def test_null_ts_ordering_mechanism_diverges_unguarded(spark):
    """The UNGUARDED gaps-and-islands (pre-round-12 form, inlined here)
    assigns the NULL-ts row to the user's FIRST session on Spark
    (NULLS FIRST) and to the LAST on DuckDB (NULLS LAST): same session
    count, same total rows, different per-session aggregates."""
    from pyspark.sql import Window

    df = spark.createDataFrame(_NULLTS_ROWS, "user_id long, ts_s double, value double")
    w = Window.partitionBy("user_id").orderBy("ts_s")
    spark_rows = [
        tuple(r)
        for r in df.select(
            "user_id",
            "ts_s",
            "value",
            F.when((F.col("ts_s") - F.lag("ts_s").over(w)) > 1800.0, 1)
            .otherwise(0)
            .alias("_new"),
        )
        .withColumn(
            "session_seq",
            F.sum("_new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            + 1,
        )
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("ts_s").alias("session_start"),
            F.max("ts_s").alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .orderBy("user_id", "session_seq")
        .collect()
    ]
    duck_rows = _nullts_duck(guard="")
    # identical shape — the driver's rows_match/schema_match stay green...
    assert len(spark_rows) == len(duck_rows) == 3
    # ...but the NULL row's membership moved: Spark glues it to the FIRST
    # session (n_events=2, sum includes 9.0), DuckDB to the LAST.
    assert spark_rows != duck_rows
    assert spark_rows[0][4] == 2 and duck_rows[0][4] == 1   # first session n_events
    assert spark_rows[-1][4] == 1 and duck_rows[-1][4] == 2  # last session n_events


def test_null_ts_contract_restores_parity(spark):
    """The shipped contract — drop NULL ts on BOTH engines — is bit-exact
    on the same adversarial fixture, via the real operator."""
    from prometheus_parquet_server_spark.streaming.sessions import sessionize_batch

    df = spark.createDataFrame(_NULLTS_ROWS, "user_id long, ts_s double, value double")
    got = [
        (r.user_id, r.session_seq, r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in sessionize_batch(df, gap_s=1800.0)
        .orderBy("user_id", "session_seq")
        .collect()
    ]
    want = _nullts_duck(guard="WHERE ts_s IS NOT NULL")
    assert [tuple(r) for r in want] == got
