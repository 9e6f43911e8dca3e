"""Snapshot store — a commit-protocol table format for object-store safety.

The directory-swap store (:mod:`.store`) is crash-safe only where rename is
atomic (local/HDFS). This module is the table-format answer the 100 TB
deployment on an object store needs (the pattern behind Delta/Iceberg,
re-implemented minimally from public knowledge): data files are IMMUTABLE
and never renamed; every change publishes a new single-file JSON manifest
whose appearance is the commit point. Readers resolve the highest readable
manifest and read exactly the files it lists — a half-finished writer is
invisible because its manifest was never published, regardless of
filesystem rename semantics.

Layout::

    <root>/data/tx_<uuid>/part-*.parquet   immutable data files
    <root>/_snapshots/v0000000001.json     manifest (the commit)

Manifest: ``{"version", "parent", "operation", "schema", "files":
[{"path", "n_rows", "n_bytes", "min_name", "max_name", "min_ts",
"max_ts"}]}``. Per-file name/ts ranges give MANIFEST-LEVEL FILE PRUNING: a
selector for one metric or time range plans a scan over only the
intersecting files — the same planning-time pruning Hive partitioning
gives the swap store, without relying on directory layout (and it
composes: data files are written name-clustered, so a one-metric read
usually touches one file per commit). The recorded schema makes a
legitimately EMPTY snapshot (everything expired / empty overwrite)
readable as an empty frame instead of an error.

Concurrency: a manifest is staged as a dot-prefixed temp file (complete
bytes, invisible to version listing) and published with exclusive-create
semantics; two writers racing to version N+1 see exactly one winner.
Appends retry against the new tip (their file list is valid under any
parent); conflicting upserts/overwrites raise :class:`ConcurrentWriteError`
for the caller to retry at the merge level (serializable semantics, no
lost updates). Readers skip any unreadable version file (legacy torn
writes) rather than wedging, and writers number PAST such junk.

Reference parity: same canonical long model as the swap store
(``TimeSeriesCollection``, src/timeseries.rs:396-445); this is the sink
side scaled past the reference's single-node filesystem assumptions.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from prometheus_parquet_server_spark.model import series_key_str
from prometheus_parquet_server_spark.sources.store import _StoreFS, read_store

_SNAP_DIR = "_snapshots"
_MAX_COMMIT_RETRIES = 10

# Serializes the exists→rename→verify critical section for writers in THIS
# process: on a replace-semantics filesystem (POSIX rename) two in-process
# threads could otherwise both slip through the exists check. Cross-process
# local-FS writers keep the (microsecond) documented caveat; HDFS
# (rename-refuses-existing) and conditional-PUT object stores are safe
# without it.
import threading as _threading

_COMMIT_LOCK = _threading.Lock()


class ConcurrentWriteError(RuntimeError):
    """Another writer committed between this transaction's read and its
    commit attempt, and the operation cannot be blindly rebased
    (overwrite/upsert). Re-run the operation against the new tip."""


def _manifest_path(root: str, version: int) -> str:
    return f"{root}/{_SNAP_DIR}/v{version:010d}.json"


def _list_versions(fs: _StoreFS, root: str) -> list[int]:
    """Every version number with a PUBLISHED manifest file — readable or
    not. Writers number past the max; readers resolve via
    :func:`_resolve_tip`, which skips unreadable entries."""
    snap = f"{root}/{_SNAP_DIR}"
    if not fs.exists(snap):
        return []
    out = []
    for st in fs.fs.listStatus(fs.jpath(snap)):
        base = str(st.getPath()).rsplit("/", 1)[-1]
        if base.startswith("v") and base.endswith(".json"):
            try:
                out.append(int(base[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _read_manifest(fs: _StoreFS, root: str, version: int) -> dict:
    stream = fs.fs.open(fs.jpath(_manifest_path(root, version)))
    try:
        # commons-io is on Spark's classpath; a py4j byte[] comes back as
        # Python bytes. (Reading into a Python bytearray would NOT work:
        # py4j passes a copy to Java, so read(buf) can't fill it.)
        data = bytes(fs._jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
        return json.loads(data.decode("utf-8"))
    finally:
        stream.close()


_TIP_HINT = ".tip_hint"  # dot-prefixed: invisible to version listing


def _write_tip_hint(fs: _StoreFS, root: str, version: int) -> None:
    """Best-effort advisory tip pointer (the Delta `_last_checkpoint`
    idea): written AFTER a successful commit, read by :func:`_resolve_tip`
    to start probing at the hinted version instead of listing the whole
    manifest directory. Purely an optimization — a missing, stale, or
    corrupt hint falls back to the listing path, and a hint is only ever
    written for a version whose manifest has already published, so
    probing forward from it cannot skip the true tip (commit numbering is
    contiguous above any published version). Failures are swallowed: the
    hint must never fail a commit that already succeeded."""
    try:
        stream = fs.fs.create(fs.jpath(f"{root}/{_SNAP_DIR}/{_TIP_HINT}"), True)
        try:
            stream.write(bytearray(str(version).encode("ascii")))
        finally:
            stream.close()
    except Exception:
        pass


def _read_tip_hint(fs: _StoreFS, root: str) -> int | None:
    try:
        stream = fs.fs.open(fs.jpath(f"{root}/{_SNAP_DIR}/{_TIP_HINT}"))
        try:
            data = bytes(
                fs._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            )
        finally:
            stream.close()
        v = int(data.decode("ascii").strip())
        return v if v >= 1 else None
    except Exception:
        return None


def _resolve_tip(fs: _StoreFS, root: str) -> tuple[int | None, dict | None]:
    """(version, manifest) of the highest READABLE snapshot — a torn or
    corrupt version file (possible only from pre-temp+rename writers or
    external tampering) is skipped, not fatal, so one bad file can never
    wedge every read and write of the store.

    Fast path: the advisory :data:`_TIP_HINT` gives a published version to
    probe FORWARD from (O(1 + commits-since-hint) exists-checks instead of
    listing a manifest directory that can hold deep retained history).
    Probing is sound because version numbers are contiguous above any
    published manifest (_target_version takes the smallest free slot).
    The walk back down from the probe top skips unreadable junk; if it
    reaches below the hinted floor — or the hint is missing / stale /
    corrupt / pointing at a vacuumed manifest — resolution falls back to
    the exhaustive listing, so the hint can never change WHAT resolves,
    only how fast."""
    hint = _read_tip_hint(fs, root)
    if hint is not None and fs.exists(_manifest_path(root, hint)):
        top = hint
        while fs.exists(_manifest_path(root, top + 1)):
            top += 1
        for v in range(top, hint - 1, -1):
            try:
                return v, _read_manifest(fs, root, v)
            except Exception:
                continue
        # every manifest from top down to the hinted floor is unreadable —
        # resolve exhaustively below it
    for v in reversed(_list_versions(fs, root)):
        try:
            return v, _read_manifest(fs, root, v)
        except Exception:
            continue
    return None, None


def _target_version(fs: _StoreFS, root: str, parent: int | None) -> int | None:
    """The version this commit must land at, as a CAS against ``parent``:
    the smallest free number above the parent, skipping only UNREADABLE
    junk slots (legacy torn writes). Returns None when a READABLE manifest
    already occupies a slot above the parent — the tip moved, the caller
    must re-resolve and rebuild its file list on the new tip. This
    determinism is what makes the commit a compare-and-swap: two racers
    that merged from the same parent compute the SAME target, so the
    exclusive publish lets exactly one through, and the loser can never
    'number past' the winner and silently drop its files."""
    t = (parent or 0) + 1
    while fs.exists(_manifest_path(root, t)):
        if _readable(fs, root, t):
            return None  # tip moved under us
        t += 1  # junk slot — skip deterministically
    return t


def _try_commit(fs: _StoreFS, root: str, manifest: dict) -> bool:
    """Publish a manifest; returns False if the version was lost to a
    racing writer. Two layers:

    - the COMPLETE bytes are first written to a dot-prefixed temp file
      (invisible to version listing), then renamed to the final name — a
      crash can no longer leave a torn ``vNNN.json``, only ignorable
      temp junk;
    - a writer nonce is verified by reading the final file back. On HDFS
      (rename fails onto an existing destination) and conditional-PUT
      object stores the rename alone decides the winner; on the LOCAL
      filesystem POSIX rename silently REPLACES, so same-version racers
      are instead decided by the read-back — the clobbered writer sees a
      foreign nonce, returns False, and retries at the next version.
      Residual local-FS caveat: a loser's rename landing between the
      winner's rename and verify makes the LOSER the survivor — still
      exactly one winner per version, no torn bytes, no lost append
      (the displaced writer fails its verify and retries).
    """
    import time as _time

    manifest = dict(
        manifest, _writer=uuid.uuid4().hex, committed_at=_time.time()
    )
    final = fs.jpath(_manifest_path(root, manifest["version"]))
    tmp = fs.jpath(
        f"{root}/{_SNAP_DIR}/.tmp_v{manifest['version']:010d}_{manifest['_writer'][:8]}.json"
    )
    fs.fs.mkdirs(fs.jpath(f"{root}/{_SNAP_DIR}"))
    stream = fs.fs.create(tmp, True)
    try:
        stream.write(bytearray(json.dumps(manifest).encode("utf-8")))
    finally:
        stream.close()
    with _COMMIT_LOCK:
        try:
            if fs.fs.exists(final) or not fs.fs.rename(tmp, final):
                fs.delete(tmp)
                return False
        except Exception:
            fs.delete(tmp)
            return False
        try:
            back = _read_manifest(fs, root, manifest["version"])
        except Exception as e:
            # the rename SUCCEEDED but the verify read failed: the commit
            # may well be live. Returning False here would make an append
            # retry and double-apply its own files on top of its own
            # commit — an ambiguous commit must fail loudly instead.
            raise IOError(
                f"commit v{manifest['version']} published but unverifiable "
                f"({e}) — inspect the store before retrying"
            ) from e
        won = back.get("_writer") == manifest["_writer"]
        if won:
            _write_tip_hint(fs, root, manifest["version"])
        return won


def _schema_json(df: DataFrame) -> dict:
    return json.loads(df.schema.json())


def _validated_append_schema(
    recorded: dict | None,
    df: DataFrame,
    merge_schema: bool,
    evolution_hint: str = "pass merge_schema=True to evolve the schema additively",
) -> dict:
    """The manifest schema an APPEND must record, after validating the
    incoming frame against the store's recorded schema. Without this
    gate a type-conflicting append COMMITS and then every read of the
    store fails on the parquet type mismatch — one dirty batch wedges
    the table permanently (the schema sibling of the NULL-key write
    rejection).

    - a column present on both sides must have the SAME type (nullability
      and metadata are not load-bearing and are ignored);
    - strict mode (default) additionally requires the same column SET —
      no new, no missing;
    - ``merge_schema`` (the public Delta mergeSchema pattern) allows NEW
      columns (recorded schema becomes the union; old files null-fill at
      read) and MISSING ones (the new files null-fill instead), but a
      type conflict stays fatal in both modes."""
    from pyspark.sql import types as T

    if recorded is None:
        return _schema_json(df)  # pre-schema store: adopt the frame's
    rec = T.StructType.fromJson(recorded)
    # simpleString compares the TYPE SHAPE and drops nullability at every
    # nesting level (StructField.nullable, array containsNull, map
    # valueContainsNull) — a map<string,string> built from non-null
    # literals must not conflict with the same map read back from
    # parquet, where the value side is nullable
    rec_types = {f.name: f.dataType.simpleString() for f in rec.fields}
    new_types = {
        f.name: f.dataType.simpleString() for f in df.schema.fields
    }
    conflicts = {
        n: (rec_types[n], t)
        for n, t in new_types.items()
        if n in rec_types and rec_types[n] != t
    }
    if conflicts:
        raise ValueError(
            f"snapshot append rejected: column type conflict with the "
            f"store's recorded schema (recorded, batch): {conflicts} — a "
            f"committed conflict would fail every later read"
        )
    added = [n for n in new_types if n not in rec_types]
    missing = [n for n in rec_types if n not in new_types]
    if not merge_schema and (added or missing):
        raise ValueError(
            f"snapshot append rejected: column set differs from the "
            f"store's recorded schema (added={added}, missing={missing}); "
            f"{evolution_hint}"
        )
    if added:
        merged = T.StructType(
            list(rec.fields)
            + [f for f in df.schema.fields if f.name in set(added)]
        )
        return json.loads(merged.json())
    return recorded  # the store's field order stays canonical


def snapshot_version(spark: SparkSession, path: str) -> int | None:
    """Highest readable committed version, or None for an uninitialized
    store."""
    fs = _StoreFS(spark, path)
    v, _ = _resolve_tip(fs, path)
    return v


def snapshot_history(spark: SparkSession, path: str) -> DataFrame:
    """(version, parent, operation, n_files, n_rows) per readable
    committed snapshot — the audit trail time travel reads."""
    fs = _StoreFS(spark, path)
    rows = []
    for v in _list_versions(fs, path):
        try:
            m = _read_manifest(fs, path, v)
        except Exception:
            continue  # legacy torn write — ignorable junk
        rows.append(
            (
                v,
                m.get("parent"),
                m.get("operation", "?"),
                len(m["files"]),
                sum(f["n_rows"] for f in m["files"]),
            )
        )
    return spark.createDataFrame(
        rows, "version long, parent long, operation string, n_files long, n_rows long"
    )


def _write_data_files(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    time_chunk_s: float | None = None,
    num_partitions: int | None = None,
) -> list[dict]:
    """Write ``df`` as immutable name-clustered data files under a fresh
    tx dir and return their manifest entries (per-file row count, size,
    and name/ts ranges, computed by ONE narrow aggregate over the files
    just written — no footer parsing, no driver loop).

    ``time_chunk_s`` switches the layout from name-major to
    name-then-time-major (the hypertable chunking pattern): the range key
    becomes (name, floor(ts/chunk), series, ts), so within a name the
    files are TIME-contiguous chunks instead of series-contiguous full
    histories. Name pruning is unchanged (still order-preserving on
    name); ts pruning becomes effective at chunk granularity — the
    name-major default gives each multi-series file a near-full-span ts
    range, which defeats manifest ts pruning for exactly the
    time-slice-over-many-series scans the grid operators issue."""
    tx = f"{path}/data/tx_{uuid.uuid4().hex[:12]}"
    if time_chunk_s is not None and not time_chunk_s > 0:
        raise ValueError(f"time_chunk_s must be > 0, got {time_chunk_s}")
    sk = series_key_str() if "labels" in df.columns else F.col("name")
    range_key = (
        ["name", "_tc", "_sk", "ts"] if time_chunk_s is not None else ["name", "_sk", "ts"]
    )
    staged = df.withColumn("_sk", sk)
    if time_chunk_s is not None:
        # NaN ts would floor to chunk 0 and silently mis-cluster — but the
        # post-write stats scan rejects any NaN-ts batch wholesale, so the
        # bucket value never reaches a committed manifest.
        staged = staged.withColumn(
            "_tc", F.floor(F.col("ts") / F.lit(float(time_chunk_s)))
        )
    range_args = ([num_partitions] if num_partitions is not None else []) + range_key
    writer = (
        # RANGE partitioning, not hash-on-name: files stay name-contiguous
        # (tight min/max name ranges → effective manifest pruning) while a
        # hot metric still splits across tasks by series key instead of
        # funneling into one writer — hash repartition("name") would be
        # the skew wall at exactly the backfill sizes that matter.
        # Frames without a labels column (e.g. rollup partial stores,
        # which carry only the canonical name/ts keys) cluster on name
        # alone — ts inside the range key keeps hot names splittable.
        # num_partitions (compaction) overrides AQE's advisory sizing so
        # outputs can GRADUATE past a caller's size threshold
        staged.repartitionByRange(*range_args)
        .sortWithinPartitions(*range_key)
        .drop("_sk")
        .write.mode("overwrite")
    )
    if time_chunk_s is not None:
        # partitionBy, not just the range key: each chunk gets its OWN
        # files regardless of how AQE coalesces the shuffle, so a chunk
        # file's manifest ts range is tight by construction. The _tc
        # value lives in the directory name only; manifest reads address
        # concrete files, so the column never resurfaces.
        writer = writer.partitionBy("_tc")
    writer.parquet(tx)
    return _tx_manifest_entries(spark, path, tx)


def _tx_manifest_entries(spark: SparkSession, path: str, tx: str) -> list[dict]:
    """Shared post-write half of :func:`_write_data_files`: list the tx
    dir, compute per-file manifest stats with ONE narrow aggregate,
    reject dirty keys wholesale, return the manifest entries. Every
    rewrite flavor (append/overwrite staging, compaction, z-order) funnels
    here so the stats/NULL-key contract cannot drift between them."""
    fs = _StoreFS(spark, path)
    listed = fs.parquet_files(tx)
    if not listed:
        # an empty partitionBy write emits only _SUCCESS (unlike the flat
        # path, which writes one schema-bearing empty file) — there are no
        # data files to reference and no stats to scan; an empty batch is
        # a legal no-op file set, not an error
        fs.delete(tx)
        return []
    stats = (
        spark.read.parquet(tx)
        .groupBy(F.input_file_name().alias("path"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("name").alias("min_name"),
            F.max("name").alias("max_name"),
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
            # rides the same stats scan for free: NULL/NaN name/ts rows
            # must never commit — they would publish JSON-null (or NaN)
            # min/max stats, and every later pruned read, expire and
            # upsert comparison on that manifest then breaks. One dirty
            # batch would wedge the store permanently.
            F.count_if(
                F.col("name").isNull() | F.col("ts").isNull() | F.isnan("ts")
            ).alias("n_bad"),
        )
        .collect()
    )
    if not stats:
        # the FLAT layout writes one schema-bearing empty part file for an
        # empty batch, so `listed` was non-empty — but zero stat groups
        # means zero rows: same no-op commit, and the tx dir must not be
        # left orphaned (frequent empty streaming micro-batches would
        # accumulate unreferenced dirs until vacuum)
        fs.delete(tx)
        return []
    n_bad = sum(r["n_bad"] for r in stats)
    if n_bad:
        fs.delete(tx)  # nothing references the tx dir yet — take it back
        raise ValueError(
            f"snapshot write rejected: {n_bad} row(s) with NULL name, NULL "
            f"ts, or NaN ts — the canonical model requires non-null finite "
            f"keys; clean the batch before committing"
        )
    # the stats job reports file:///x, the FS listing file:/x — key both
    # by the URI path component
    sizes = {str(fs.jpath(p).toUri().getPath()): sz for p, sz in listed}

    def _size(p: str) -> int:
        return sizes.get(str(fs.jpath(p).toUri().getPath()), 0)

    return [
        {
            "path": r["path"],
            "n_rows": r["n_rows"],
            "n_bytes": _size(r["path"]),
            "min_name": r["min_name"],
            "max_name": r["max_name"],
            "min_ts": r["min_ts"],
            "max_ts": r["max_ts"],
            # attestation the NULL-key rejection above just earned: every
            # row in this file has non-null finite keys, so min/max stats
            # DESCRIBE EVERY ROW. snapshot_delete's zero-scan contained
            # drop requires it — min/max are null-blind, so a foreign
            # file (external tooling, pre-guard manifests) could hide
            # NULL-key rows inside a "fully contained" range; entries
            # without the flag route to the scan-and-rewrite path where
            # the null-safe filter decides row by row.
            "null_free": True,
        }
        for r in stats
    ]


def _name_overlaps(f: dict, names) -> bool:
    """Does a manifest file entry's name range intersect ``names``?
    Null stats (a pre-guard manifest written before the NULL/NaN write
    rejection, or external tooling) are treated as ALWAYS intersecting —
    the file is read and row-filtered instead of wedging the plan with a
    None comparison; correctness never depends on pruning."""
    if f.get("min_name") is None or f.get("max_name") is None:
        return True
    return any(f["min_name"] <= n <= f["max_name"] for n in names)


def _ts_overlaps(f: dict, lo: float, hi: float) -> bool:
    """Ts-range analogue of :func:`_name_overlaps` (null-stat entries
    always intersect; NaN stats fail both comparisons and also land on
    the safe read-it side via the ``not``)."""
    mn, mx = f.get("min_ts"), f.get("max_ts")
    if mn is None or mx is None:
        return True
    return not (mx < lo or mn > hi)


def _pinned_reader(spark: SparkSession, parent_m: dict | None):
    """A reader pinned to the manifest-recorded schema when one exists —
    every maintenance rewrite (upsert, merge, compact, expire) must read
    base files through it, or a schema-evolved store's heterogeneous
    files make the rewrite depend on which footer Spark sampled (and a
    file predating a merged column would DROP that column from the
    rewritten rows)."""
    if parent_m is not None and parent_m.get("schema") is not None:
        from pyspark.sql import types as T

        return spark.read.schema(T.StructType.fromJson(parent_m["schema"]))
    return spark.read


def _inherited_chunk(parent_m: dict | None) -> float | None:
    """The store's pinned ``time_chunk_s`` layout property, if any — every
    maintenance rewrite (upsert, merge, compact, expire) must re-apply it
    or the rewritten files silently fall back to the name-major layout."""
    tc = ((parent_m or {}).get("properties") or {}).get("time_chunk_s")
    return float(tc) if tc is not None else None


def snapshot_write(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    mode: str = "append",
    time_chunk_s: float | None = None,
    txn: tuple[str, int] | None = None,
    properties: dict | None = None,
    require_parent: int | None = None,
    merge_schema: bool = False,
) -> int:
    """Commit ``df`` as a new snapshot. ``mode='append'`` adds its files to
    the current file set (and survives commit races by rebasing onto the
    new tip — an append's file list is valid against any parent);
    ``mode='overwrite'`` replaces the file set entirely (a race raises
    :class:`ConcurrentWriteError`). Returns the committed version.

    Appends are schema-validated against the store's recorded schema
    BEFORE any data file is written (see
    :func:`_validated_append_schema`): same-name columns must type-match
    in every mode; the column set must match exactly unless
    ``merge_schema=True``, which admits additive evolution (new columns
    join the recorded schema, old files null-fill; missing columns
    null-fill the new files) — type conflicts stay fatal because a
    committed conflict fails every later read of the store.

    ``time_chunk_s`` opts the new files into the time-chunked layout (see
    :func:`_write_data_files`) and pins the width as the store property
    ``time_chunk_s`` so later appends keep the layout without restating
    it; pass it explicitly to change the width (layout is physical, not
    semantic — mixed widths degrade pruning, never correctness).

    ``txn=(app_id, version)`` makes an APPEND idempotent per writer — the
    same Delta txnAppId/txnVersion pattern :func:`snapshot_merge` carries:
    the manifest property ``txn_<app_id>`` records the highest version
    committed by that writer, an append whose version is ≤ the recorded
    value returns the current tip WITHOUT writing (the foreachBatch
    redelivery dedupe for append-shaped sinks, e.g. streaming vector
    ingest where replayed rows would otherwise duplicate), and the marker
    rides the same atomic manifest as the data. Overwrite + txn raises —
    an overwrite replaces history, so "already committed" has no meaning
    for it. The marker is only meaningful within ONE writer lineage
    (e.g. one streaming checkpoint): resetting the checkpoint restarts
    batch ids at 0 against a store that remembers higher ones — callers
    MUST change the app_id when they reset the lineage.

    ``properties``: extra manifest properties for this commit. On append
    they merge over the inherited set and a CONFLICTING re-declaration
    raises (the snapshot_merge rule); on overwrite they become the fresh
    store's property set — the hook a rebuild uses to carry txn markers
    forward across the history reset.

    ``require_parent`` (append only): CAS the append against an expected
    parent version — if the tip moved, raise :class:`ConcurrentWriteError`
    instead of rebasing. For appends whose CONTENT depends on what they
    read from the store (e.g. vectors clustered under the tip's
    centroids), a blind rebase would commit rows that are silently wrong
    against the new tip."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be 'append' or 'overwrite', got {mode!r}")
    txn_key = None
    if require_parent is not None and mode != "append":
        raise ValueError("snapshot_write: require_parent is append-only")
    if txn is not None:
        if mode != "append":
            raise ValueError("snapshot_write: txn markers are append-only")
        app_id, txn_version = txn
        if not app_id or "\n" in str(app_id):
            raise ValueError(f"txn app_id must be a non-empty line, got {app_id!r}")
        txn_key = f"txn_{app_id}"
    fs = _StoreFS(spark, path)
    # one tip resolve serves both layout inheritance and the commit's
    # expected-parent check — appends run per streaming micro-batch, so
    # a second directory listing + manifest read per call is real driver
    # I/O, not noise
    expected, expected_m = _resolve_tip(fs, path)
    if txn_key is not None and expected_m is not None:
        recorded = ((expected_m.get("properties") or {})).get(txn_key)
        if recorded is not None and int(txn[1]) <= int(recorded):
            return expected  # already committed — redelivery no-op, no write
    if time_chunk_s is None and mode == "append":
        time_chunk_s = _inherited_chunk(expected_m)
    if mode == "append":
        # validate BEFORE writing data files — a rejected batch must not
        # leave a tx dir for vacuum to sweep
        schema = _validated_append_schema(
            (expected_m or {}).get("schema"), df, merge_schema
        )
    else:
        schema = _schema_json(df)
    new_files = _write_data_files(spark, path, df, time_chunk_s=time_chunk_s)
    for attempt in range(_MAX_COMMIT_RETRIES):
        parent, parent_m = (
            (expected, expected_m) if attempt == 0 else _resolve_tip(fs, path)
        )
        if mode == "overwrite" and parent != expected:
            raise ConcurrentWriteError(
                f"overwrite prepared against v{expected} but tip moved to v{parent}"
            )
        if require_parent is not None and parent != require_parent:
            raise ConcurrentWriteError(
                f"append required parent v{require_parent} but tip is v{parent}"
            )
        base: list[dict] = []
        if mode == "append" and parent is not None:
            if parent_m is None:
                parent_m = _read_manifest(fs, path, parent)
            base = parent_m["files"]
            if attempt > 0:
                # a rebase lands on a DIFFERENT parent — its schema may
                # have evolved since the pre-write validation
                schema = _validated_append_schema(
                    parent_m.get("schema"), df, merge_schema
                )
        target = _target_version(fs, path, parent)
        if target is None:
            continue  # tip moved between resolve and target — rebase
        manifest = {
            "version": target,
            "parent": parent,
            "operation": mode,
            "schema": schema,
            "files": base + new_files,
        }
        # properties travel with the store: appends inherit the parent's
        # (an overwrite is a fresh start and drops them)
        if mode == "append" and parent is not None:
            _props = (parent_m or _read_manifest(fs, path, parent)).get("properties")
            if _props:
                manifest["properties"] = dict(_props)
        if properties:
            inherited = manifest.get("properties") or {}
            conflicts = {
                k: (inherited[k], v)
                for k, v in properties.items()
                if k in inherited and inherited[k] != v
            }
            if mode == "append" and conflicts:
                raise ValueError(
                    f"snapshot_write: properties conflict with the store's "
                    f"recorded values (recorded, supplied): {conflicts}"
                )
            manifest["properties"] = {**inherited, **properties}
        if time_chunk_s is not None:
            manifest.setdefault("properties", {})["time_chunk_s"] = float(
                time_chunk_s
            )
        if txn_key is not None:
            # re-check against THIS parent: a rebase may have landed a newer
            # marker (same-writer redelivery racing itself); ≤ means the
            # batch already committed and the prepared files are orphans
            # the next vacuum sweeps
            recorded = (manifest.get("properties") or {}).get(txn_key)
            if recorded is not None and int(txn[1]) <= int(recorded):
                return parent
            manifest.setdefault("properties", {})[txn_key] = int(txn[1])
        if _try_commit(fs, path, manifest):
            return manifest["version"]
    raise ConcurrentWriteError(
        f"lost {_MAX_COMMIT_RETRIES} straight commit races on {path}"
    )


def snapshot_read(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    names: list[str] | None = None,
    ts_range: tuple[float, float] | None = None,
) -> DataFrame:
    """Read a snapshot (latest readable, or ``version`` for time travel),
    planning the scan over only the files whose manifest name/ts ranges
    intersect the ``names`` / ``ts_range`` predicates — file pruning at
    the driver from manifest stats alone, before any footer is opened.
    The residual row-level filter is applied too, so the result is exact.
    An empty snapshot (everything expired, empty overwrite) returns an
    empty frame with the manifest-recorded schema."""
    fs = _StoreFS(spark, path)
    if version is None:
        version, m = _resolve_tip(fs, path)
        if version is None:
            raise FileNotFoundError(f"no committed snapshot under {path}")
    else:
        m = _read_manifest(fs, path, version)
    files = m["files"]
    if names is not None:
        files = [f for f in files if _name_overlaps(f, names)]
    if ts_range is not None:
        lo, hi = ts_range
        files = [f for f in files if _ts_overlaps(f, lo, hi)]
    if not files:
        from pyspark.sql import types as T

        if m.get("schema") is not None:
            return spark.createDataFrame([], T.StructType.fromJson(m["schema"]))
        if m["files"]:  # pruned to nothing: borrow any base file's schema
            schema = spark.read.parquet(m["files"][0]["path"]).schema
            return spark.createDataFrame([], schema)
        raise FileNotFoundError(
            f"snapshot v{version} of {path} is empty and predates recorded schemas"
        )
    reader = spark.read
    if m.get("schema") is not None:
        # pin the scan to the manifest-recorded schema: with merge_schema
        # evolution the files are heterogeneous, and letting Spark infer
        # from a sampled footer makes the visible column set depend on
        # WHICH file it sampled — the recorded schema is the store's
        # truth, and files missing a column null-fill deterministically
        from pyspark.sql import types as T

        reader = reader.schema(T.StructType.fromJson(m["schema"]))
    df = reader.parquet(*[f["path"] for f in files])
    if names is not None:
        df = df.filter(F.col("name").isin(names))
    if ts_range is not None:
        df = df.filter(F.col("ts").between(ts_range[0], ts_range[1]))
    return df


def snapshot_upsert(spark: SparkSession, path: str, updates: DataFrame) -> int:
    """Merge ``updates`` (replace same (series key, ts); append new) and
    commit. Only files whose name range intersects the touched metrics are
    rewritten; every other file carries over by reference — the rewrite
    cost is proportional to the touched data, not the store. A commit race
    raises :class:`ConcurrentWriteError` (the merge read a tip that moved;
    blind rebase could lose the racer's rows)."""
    fs = _StoreFS(spark, path)
    updates = updates.cache()
    try:
        distinct_names = [
            r["name"] for r in updates.select("name").distinct().collect()
        ]
        # same contract _write_data_files enforces, surfaced before any
        # work happens (and before sorted() trips over None): NULL names
        # have no place in the canonical model
        if any(n is None for n in distinct_names):
            raise ValueError(
                "snapshot_upsert: updates contain NULL metric names — "
                "clean the batch before committing"
            )
        names = sorted(distinct_names)
        if not names:
            return snapshot_version(spark, path) or 0
        parent, parent_m = _resolve_tip(fs, path)
        base_files: list[dict] = parent_m["files"] if parent_m else []
        touched = [f for f in base_files if _name_overlaps(f, names)]
        # set-of-paths membership: list `in` is O(files x touched) full-dict
        # comparisons on the driver — quadratic at the ~1e5-file stores the
        # manifest design targets
        _tp = {f["path"] for f in touched}
        kept = [f for f in base_files if f["path"] not in _tp]
        # strict schema check (the append gate's upsert twin): updates
        # that dropped a store column would silently erase it from every
        # rewritten row of the touched files
        _validated_append_schema(
            (parent_m or {}).get("schema"), updates, merge_schema=False
        )
        merged = updates.withColumn("_prio", F.lit(0))
        if touched:
            existing = _pinned_reader(spark, parent_m).parquet(
                *[f["path"] for f in touched]
            ).withColumn("_prio", F.lit(1))
            merged = merged.unionByName(existing.select(*merged.columns))
        merged = merged.withColumn("_sk", series_key_str())
        w = Window.partitionBy("_sk", "ts").orderBy("_prio", F.col("value").desc())
        out = (
            merged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_prio", "_rn", "_sk")
        )
        new_files = _write_data_files(
            spark, path, out, time_chunk_s=_inherited_chunk(parent_m)
        )
        target = _target_version(fs, path, parent)
        if target is None:
            raise ConcurrentWriteError(
                f"upsert prepared against v{parent} but the tip moved — "
                f"re-run against the new tip"
            )
        _props = (parent_m or {}).get("properties")
        manifest = {
            "version": target,
            "parent": parent,
            "operation": "upsert",
            # most files carry over from the base, so the PARENT's schema
            # is the store's schema; recording the updates' schema would
            # let a differently-ordered or narrower update batch change
            # what a later empty/fully-pruned read reports
            "schema": (parent_m.get("schema") if parent_m else None)
            or _schema_json(updates),
            "files": kept + new_files,
        }
        if _props:
            manifest["properties"] = _props
        if not _try_commit(fs, path, manifest):
            raise ConcurrentWriteError(
                f"upsert prepared against v{parent} but v{manifest['version']} "
                f"already exists — re-run against the new tip"
            )
        return manifest["version"]
    finally:
        updates.unpersist()


def snapshot_merge(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    combine,
    properties: dict | None = None,
    txn: tuple[str, int] | None = None,
    num_partitions: int | None = None,
) -> int:
    """Generalized read-modify-write commit — the primitive behind
    incremental materialized aggregates (operators/rollup.py
    rollup_ingest): files whose manifest name range intersects the
    updates' metric names are read back as ``existing`` and REPLACED by
    ``combine(existing, updates)`` (``existing`` is None when nothing
    intersects — a fresh store or disjoint names); every other file
    carries over by reference, so the rewrite cost is proportional to the
    touched data, not the store. Unlike :func:`snapshot_upsert` (which
    fixes replace-by-(series, ts) semantics) the merge function is the
    caller's — additive partial folding, counters, CRDT-style joins.

    **Combine contract:** files are touched by NAME-RANGE overlap, so
    ``existing`` can contain rows for metric names OUTSIDE ``updates``
    (bystanders sharing a file with a touched name). ``combine`` MUST
    preserve every ``existing`` row it does not intentionally replace —
    a combine that only emits rows for the updated names silently deletes
    the bystanders from the committed snapshot. Union-then-regroup shapes
    (rollup_ingest's additive fold) satisfy this by construction.

    ``properties`` (a small JSON-able dict) is recorded in the manifest
    and inherited by later commits; supplying a value that CONFLICTS with
    the parent manifest's recorded value raises — the immutability hook
    rollup stores use to pin their ingest width. Read back via
    :func:`snapshot_properties`.

    ``txn=(app_id, version)`` makes the commit IDEMPOTENT per writer —
    the public Delta-Lake txnAppId/txnVersion pattern: the manifest
    property ``txn_<app_id>`` records the highest version committed by
    that writer, and a merge whose ``version`` is ≤ the recorded value
    returns the current tip WITHOUT folding (the batch already landed;
    this is the redelivery dedupe a ``foreachBatch`` sink needs when a
    fold commits but the streaming offsets don't). Unlike ``properties``
    keys, the txn marker is deliberately monotonic — it bypasses the
    conflict check and rides the SAME atomic manifest as the folded data,
    so there is no window where the data is applied but the marker isn't.

    A commit race raises :class:`ConcurrentWriteError` (blind rebase could
    lose the racer's contribution to the combined rows). An empty update
    batch is a no-op returning the current version — and raises
    FileNotFoundError on an uninitialized store (there is no version to
    return, and silently answering 0 would name a nonexistent snapshot).

    ``num_partitions`` is the caller's write-width hint for BOUNDED stores
    (r15): a merge whose combined frame is capped by construction (e.g. a
    DSIR counts store holds ≤ m rows per side at ANY corpus size) should
    write that many files, not ``spark.sql.shuffle.partitions`` range
    slices — the default 32-way range sampling + 32 tiny files is pure
    overhead per commit and multiplies the files every later read-back
    opens. None keeps the adaptive default (unbounded stores).
    """
    fs = _StoreFS(spark, path)
    updates = updates.cache()
    try:
        distinct_names = [
            r["name"] for r in updates.select("name").distinct().collect()
        ]
        if any(n is None for n in distinct_names):
            raise ValueError(
                "snapshot_merge: updates contain NULL metric names — "
                "clean the batch before committing"
            )
        names = sorted(distinct_names)
        if not names:
            v = snapshot_version(spark, path)
            if v is None:
                raise FileNotFoundError(
                    f"snapshot_merge: empty updates on uninitialized store "
                    f"{path} — nothing to commit and no version to return"
                )
            return v
        parent, parent_m = _resolve_tip(fs, path)
        parent_props = (parent_m or {}).get("properties") or {}
        txn_key = None
        if txn is not None:
            app_id, txn_version = txn
            if not app_id or "\n" in str(app_id):
                raise ValueError(f"txn app_id must be a non-empty line, got {app_id!r}")
            txn_key = f"txn_{app_id}"
            recorded = parent_props.get(txn_key)
            if recorded is not None and int(txn_version) <= int(recorded):
                if parent is None:  # unreachable: recorded implies a manifest
                    raise FileNotFoundError(path)
                return parent  # this batch already folded — redelivery no-op
        if properties:
            conflicts = {
                k: (parent_props[k], v)
                for k, v in properties.items()
                if k in parent_props and parent_props[k] != v
            }
            if conflicts:
                raise ValueError(
                    f"snapshot_merge: properties conflict with the store's "
                    f"recorded values (recorded, supplied): {conflicts}"
                )
        merged_props = {**parent_props, **(properties or {})}
        if txn_key is not None:
            merged_props[txn_key] = int(txn[1])
        base_files: list[dict] = parent_m["files"] if parent_m else []
        touched = [f for f in base_files if _name_overlaps(f, names)]
        # set-of-paths membership: list `in` is O(files x touched) full-dict
        # comparisons on the driver — quadratic at the ~1e5-file stores the
        # manifest design targets
        _tp = {f["path"] for f in touched}
        kept = [f for f in base_files if f["path"] not in _tp]
        existing = (
            _pinned_reader(spark, parent_m).parquet(*[f["path"] for f in touched])
            if touched
            else None
        )
        out = combine(existing, updates)
        # the combined frame replaces the touched files — a schema drift
        # here (combine dropped or retyped a column) is the same
        # wedge/erasure hazard the append gate closes
        _validated_append_schema(
            (parent_m or {}).get("schema"), out, merge_schema=False
        )
        new_files = _write_data_files(
            spark, path, out, time_chunk_s=_inherited_chunk(parent_m),
            num_partitions=num_partitions,
        )
        target = _target_version(fs, path, parent)
        if target is None:
            raise ConcurrentWriteError(
                f"merge prepared against v{parent} but the tip moved — "
                f"re-run against the new tip"
            )
        manifest = {
            "version": target,
            "parent": parent,
            "operation": "merge",
            "schema": (parent_m.get("schema") if parent_m else None)
            or _schema_json(out),
            "files": kept + new_files,
        }
        if merged_props:
            manifest["properties"] = merged_props
        if not _try_commit(fs, path, manifest):
            raise ConcurrentWriteError(
                f"merge prepared against v{parent} but v{manifest['version']} "
                f"already exists — re-run against the new tip"
            )
        return manifest["version"]
    finally:
        updates.unpersist()


def snapshot_stats(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    names: list[str] | None = None,
    ts_range: tuple[float, float] | None = None,
) -> dict:
    """Metadata-query fast path: exact ``{n_rows, n_files, n_bytes,
    min_name, max_name, min_ts, max_ts}`` for a (possibly filtered)
    snapshot, answered from MANIFEST ARITHMETIC wherever possible.

    A file is CONTAINED when every row it can hold satisfies the
    predicate (ts: ``lo <= min_ts and max_ts <= hi``; names: the file is
    single-name — ``min_name == max_name`` — and that name is selected;
    no-predicate: always). Contained files contribute their recorded
    ``n_rows``/ranges without being opened; only BOUNDARY files (ranges
    intersect the predicate but are not contained, or null stats) are
    scanned with the residual row filter. So an UNFILTERED stats query
    opens ZERO data files at any store size — the answer to "how many
    rows / what time span does this 100 TB table cover" is O(manifest) —
    and a filtered one opens only the predicate's edge. This is the
    library-level stand-in for DSv2 aggregate pushdown, which the Python
    DataSource API does not expose (no SupportsPushDownAggregates
    equivalent — documented upstream limitation); the JVM v1 path does
    not engage footer-stat aggregates either (measured, round-7 ledger).

    ``n_bytes``/``n_files`` count every predicate-INTERSECTING file (the
    I/O a real scan would plan), not just contained ones."""
    fs = _StoreFS(spark, path)
    if version is None:
        version, m = _resolve_tip(fs, path)
        if version is None:
            raise FileNotFoundError(f"no committed snapshot under {path}")
    else:
        m = _read_manifest(fs, path, version)
    files = m["files"]
    if names is not None:
        files = [f for f in files if _name_overlaps(f, names)]
    if ts_range is not None:
        lo, hi = ts_range
        files = [f for f in files if _ts_overlaps(f, lo, hi)]

    def _contained(f: dict) -> bool:
        if names is not None:
            if f.get("min_name") is None or f["min_name"] != f.get("max_name"):
                return False
            if f["min_name"] not in names:
                return False
        if ts_range is not None:
            mn, mx = f.get("min_ts"), f.get("max_ts")
            if mn is None or mx is None or not (lo <= mn and mx <= hi):
                return False
        return True

    inside = [f for f in files if _contained(f)]
    boundary = [f for f in files if not _contained(f)]

    n_rows = sum(f["n_rows"] for f in inside)
    mins_n = [f["min_name"] for f in inside if f.get("min_name") is not None]
    maxs_n = [f["max_name"] for f in inside if f.get("max_name") is not None]
    mins_t = [f["min_ts"] for f in inside if f.get("min_ts") is not None]
    maxs_t = [f["max_ts"] for f in inside if f.get("max_ts") is not None]

    if boundary:
        df = _pinned_reader(spark, m).parquet(*[f["path"] for f in boundary])
        if names is not None:
            df = df.filter(F.col("name").isin(list(names)))
        if ts_range is not None:
            df = df.filter(F.col("ts").between(lo, hi))
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("name").alias("mn_n"),
            F.max("name").alias("mx_n"),
            F.min("ts").alias("mn_t"),
            F.max("ts").alias("mx_t"),
        ).first()
        n_rows += row["n"]
        if row["mn_n"] is not None:
            mins_n.append(row["mn_n"])
            maxs_n.append(row["mx_n"])
        if row["mn_t"] is not None:
            mins_t.append(row["mn_t"])
            maxs_t.append(row["mx_t"])

    return {
        "version": version,
        "n_rows": n_rows,
        "n_files": len(files),
        "n_bytes": sum(f.get("n_bytes", 0) for f in files),
        "n_files_scanned": len(boundary),
        "min_name": min(mins_n) if mins_n else None,
        "max_name": max(maxs_n) if maxs_n else None,
        "min_ts": min(mins_t) if mins_t else None,
        "max_ts": max(maxs_t) if maxs_t else None,
    }


def snapshot_properties(
    spark: SparkSession, path: str, version: int | None = None
) -> dict:
    """The recorded ``properties`` dict ({} when none) of the tip
    manifest — or of ``version``, for callers that pinned one and must
    not mix reads across a concurrent commit — small caller-defined
    facts that travel with the store (e.g. a rollup store's ingest
    width). Inherited commit-to-commit by :func:`snapshot_merge`, which
    rejects conflicting re-declarations."""
    fs = _StoreFS(spark, path)
    if version is None:
        _, m = _resolve_tip(fs, path)
    else:
        m = _read_manifest(fs, path, version)
    return (m or {}).get("properties") or {}


def snapshot_compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
) -> int | None:
    """Rewrite the UNDER-SIZED files into ~target-sized name-clustered
    files and commit; files already at or above the target carry over by
    reference — compaction cost is proportional to the small-file debt,
    never to store size (a 100 TB store with a few fragmented recent
    commits rewrites only those). Content is identical (same rows, new
    layout); old versions still read the old files (time travel keeps
    working until :func:`snapshot_vacuum` reclaims them). Files from
    manifests without a recorded size are treated as small (rewritten
    once, gaining a size entry). Returns the new version, or None if
    there was nothing to compact."""
    fs = _StoreFS(spark, path)
    parent, parent_m = _resolve_tip(fs, path)
    if parent is None:
        return None
    base = parent_m["files"]
    small = [f for f in base if f.get("n_bytes", 0) < target_file_bytes]
    if len(small) < min_files_to_compact:
        return None
    _sp = {f["path"] for f in small}  # paths are unique manifest keys
    kept = [f for f in base if f["path"] not in _sp]
    _reader = spark.read
    if parent_m.get("schema") is not None:
        # schema-evolved stores hold heterogeneous files — pin the rewrite
        # to the recorded schema so compaction output is homogeneous
        from pyspark.sql import types as T

        _reader = _reader.schema(T.StructType.fromJson(parent_m["schema"]))
    df = _reader.parquet(*[f["path"] for f in small])
    # aim the rewrite at ~target-sized OUTPUT files: without an explicit
    # partition count, AQE's ~64 MB advisory keeps every output below a
    # 128 MB target forever, so each later compaction re-reads the same
    # bytes as "still small" — the quadratic-I/O failure mode. ceil(total
    # small bytes / target) partitions lets merged files graduate past
    # the threshold and carry over by reference next time.
    small_bytes = sum(f.get("n_bytes", 0) for f in small)
    n_out = max(1, -(-small_bytes // target_file_bytes)) if small_bytes else 1
    # a time-chunked store keeps its layout through compaction
    new_files = _write_data_files(
        spark, path, df, time_chunk_s=_inherited_chunk(parent_m),
        num_partitions=n_out,
    )
    target = _target_version(fs, path, parent)
    if target is None:
        raise ConcurrentWriteError(
            f"compact prepared against v{parent} but the tip moved"
        )
    manifest = {
        "version": target,
        "parent": parent,
        "operation": "compact",
        "schema": parent_m.get("schema") or _schema_json(df),
        "files": kept + new_files,
    }
    if parent_m.get("properties"):
        manifest["properties"] = parent_m["properties"]
    if not _try_commit(fs, path, manifest):
        raise ConcurrentWriteError(
            f"compact prepared against v{parent} but the tip moved"
        )
    return manifest["version"]


def snapshot_zorder(
    spark: SparkSession,
    path: str,
    bits: int = 8,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int | None:
    """OPTIMIZE ZORDER over (name, ts): rewrite the tip's data files
    clustered on the interleaved-bit rank of BOTH keys, so manifest
    min/max pruning is effective for name-only, ts-only AND combined
    predicates at once — the multi-dimensional answer to the layout
    trade the writer makes (name-major files have near-full-span ts
    ranges; time-chunked files trade name tightness inside a chunk).
    The Delta/Iceberg OPTIMIZE ZORDER analog, expressed Spark-first.

    Per-key ranks come from Spark's own distributed range partitioner
    (``repartitionByRange(2^bits, key)`` + ``spark_partition_id()`` —
    sampled quantile buckets, no driver-side value collection, works for
    strings and doubles alike); the z-value interleaves the two
    ``bits``-wide bucket ids, and the rewrite range-partitions on it.
    Three shuffles of the store — an explicit maintenance operation, same
    cost class as a full compaction.

    Content is identical (same rows, new layout); time travel keeps
    serving old versions until vacuum. Stores with a time-chunk layout
    property refuse (their directory chunking IS a clustering contract;
    z-ordering would silently break the chunk-per-file ts-tightness
    invariant). Returns the new version, or None on an empty store.
    """
    if not 1 <= bits <= 16:
        raise ValueError(f"bits must be in [1, 16], got {bits}")
    fs = _StoreFS(spark, path)
    parent, parent_m = _resolve_tip(fs, path)
    if parent is None:
        return None
    if _inherited_chunk(parent_m) is not None:
        raise ValueError(
            "snapshot_zorder refuses a time-chunked store: the chunk "
            "layout is a clustering contract of its own (rebuild the "
            "store without time_chunk_s to z-order it)"
        )
    if not parent_m["files"]:
        return None
    reader = spark.read
    if parent_m.get("schema") is not None:
        from pyspark.sql import types as T

        reader = reader.schema(T.StructType.fromJson(parent_m["schema"]))
    df = reader.parquet(*[f["path"] for f in parent_m["files"]])

    b = 1 << bits
    # rank buckets via the range partitioner: partition ids are ordered by
    # range, so spark_partition_id() IS the per-key quantile bucket
    staged = df.repartitionByRange(b, "name").withColumn(
        "_zb_n", F.spark_partition_id().cast("long")
    )
    staged = staged.repartitionByRange(b, "ts").withColumn(
        "_zb_t", F.spark_partition_id().cast("long")
    )
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright("_zb_n", i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright("_zb_t", i).bitwiseAND(F.lit(1)), 2 * i)
        )
    total_bytes = sum(f.get("n_bytes", 0) for f in parent_m["files"])
    n_out = max(1, -(-total_bytes // target_file_bytes)) if total_bytes else 1
    tx = f"{path}/data/tx_{uuid.uuid4().hex[:12]}"
    (
        staged.withColumn("_z", z)
        .repartitionByRange(n_out, "_z")
        .sortWithinPartitions("_z", "name", "ts")
        .drop("_zb_n", "_zb_t", "_z")
        .write.mode("overwrite")
        .parquet(tx)
    )
    new_files = _tx_manifest_entries(spark, path, tx)
    target = _target_version(fs, path, parent)
    if target is None:
        raise ConcurrentWriteError(
            f"zorder prepared against v{parent} but the tip moved"
        )
    manifest = {
        "version": target,
        "parent": parent,
        "operation": "zorder",
        "schema": parent_m.get("schema") or _schema_json(df),
        "files": new_files,
    }
    if parent_m.get("properties"):
        manifest["properties"] = parent_m["properties"]
    if not _try_commit(fs, path, manifest):
        raise ConcurrentWriteError(
            f"zorder prepared against v{parent} but the tip moved"
        )
    return manifest["version"]


def snapshot_as_of(spark: SparkSession, path: str, ts: float) -> int | None:
    """Time travel by wall clock: the highest readable version whose
    commit time is <= ``ts`` (epoch seconds) — "the store as it was at
    2 a.m.". Versions without a recorded commit time (pre-round-6) are
    treated as infinitely old, i.e. always eligible."""
    fs = _StoreFS(spark, path)
    for v in reversed(_list_versions(fs, path)):
        try:
            m = _read_manifest(fs, path, v)
        except Exception:
            continue
        if m.get("committed_at", float("-inf")) <= ts:
            return v
    return None


def snapshot_clone(
    spark: SparkSession,
    source: str,
    dest: str,
    version: int | None = None,
) -> int:
    """SHALLOW CLONE: create a new store at ``dest`` whose v1 manifest
    references the SOURCE's data files by absolute path — a zero-copy
    table fork (the Delta ``CREATE TABLE ... SHALLOW CLONE`` verb) for
    sandboxing experiments against production data. O(manifest), no data
    read or written.

    Divergence is safe by construction: writes to the clone stage files
    under the CLONE's own ``data/`` dir; the clone's vacuum lists only
    that dir, so it can never delete source files, and a clone compaction
    gradually materializes source-referenced content into clone-owned
    files. The one cross-store hazard is the source's own vacuum — it
    cannot see clone manifests, so reclaiming source history can orphan a
    clone still referencing it (Delta's documented shallow-clone caveat);
    clone from a version you retain, or compact the clone to detach it.

    ``version`` clones a historical snapshot (defaults to the tip).
    ``dest`` must not already hold a committed store. Returns the clone's
    version (always 1)."""
    sfs = _StoreFS(spark, source)
    if version is None:
        version, m = _resolve_tip(sfs, source)
        if version is None:
            raise FileNotFoundError(f"no committed snapshot under {source}")
    else:
        m = _read_manifest(sfs, source, version)
    dfs = _StoreFS(spark, dest)
    if _resolve_tip(dfs, dest)[0] is not None:
        raise ValueError(
            f"snapshot_clone refuses: {dest} already holds a committed "
            f"store (cloning over it would orphan its history)"
        )
    manifest = {
        "version": 1,
        "parent": None,
        "operation": "clone",
        "cloned_from": {"path": source, "version": version},
        "schema": m.get("schema"),
        "files": m["files"],
    }
    if m.get("properties"):
        manifest["properties"] = m["properties"]
    if not _try_commit(dfs, dest, manifest):
        raise ConcurrentWriteError(
            f"clone of {source} v{version} lost the v1 commit race at {dest}"
        )
    return 1


def snapshot_restore(spark: SparkSession, path: str, version: int) -> int:
    """RESTORE: make an old version the new tip as a FORWARD commit (the
    Delta ``RESTORE TO VERSION`` verb) — pure manifest arithmetic: the
    new manifest references ``version``'s file list (plus its schema and
    properties); no data file is read, written, or deleted, so restore is
    O(1) regardless of store size and the rolled-back-over history stays
    time-travelable until vacuum. Raises if ``version`` is unreadable
    (never committed, or its files already vacuumed — restoring it would
    publish a tip that cannot be scanned)."""
    fs = _StoreFS(spark, path)
    parent, _parent_m = _resolve_tip(fs, path)
    if parent is None:
        raise FileNotFoundError(f"no committed snapshot under {path}")
    if version == parent:
        return parent  # restoring the tip is a no-op, not a new commit
    if not _readable(fs, path, version):
        raise ValueError(
            f"cannot restore v{version}: not committed, or its data files "
            f"were vacuumed (an unreadable tip would wedge every reader)"
        )
    m = _read_manifest(fs, path, version)
    target = _target_version(fs, path, parent)
    if target is None:
        raise ConcurrentWriteError(
            f"restore prepared against v{parent} but the tip moved"
        )
    manifest = {
        "version": target,
        "parent": parent,
        "operation": "restore",
        "restored_version": version,
        "schema": m.get("schema"),
        "files": m["files"],
    }
    if m.get("properties"):
        manifest["properties"] = m["properties"]
    if not _try_commit(fs, path, manifest):
        raise ConcurrentWriteError(
            f"restore prepared against v{parent} but the tip moved"
        )
    return manifest["version"]


def snapshot_select(
    spark: SparkSession,
    path: str,
    matchers,
    version: int | None = None,
    ts_range: tuple[float, float] | None = None,
) -> DataFrame:
    """PromQL-style selector over a snapshot store: equality ``__name__``
    matchers prune files at the MANIFEST level (driver-side, before any
    footer opens — the snapshot store's analogue of the swap store's
    Hive partition pruning), then every matcher applies exactly via the
    engine's selector (operators/select.py select_series). The query
    surface and the table format compose: a one-metric selector on a
    10^5-file store plans a scan over the handful of files whose name
    range covers that metric. ``ts_range`` adds the time dimension — on a
    time-chunked store (snapshot_write(time_chunk_s=...)) a grid query's
    window prunes to the touched chunks' files."""
    from prometheus_parquet_server_spark.labels import NAME_LABEL
    from prometheus_parquet_server_spark.operators.select import select_series

    names = [
        m.value for m in matchers if m.label == NAME_LABEL and m.op == "="
    ] or None
    df = snapshot_read(spark, path, version=version, names=names, ts_range=ts_range)
    return select_series(df, list(matchers))


def read_any_store(spark: SparkSession, path: str) -> DataFrame:
    """Unified store reader: a path with committed snapshots under
    ``_snapshots/`` resolves to :func:`snapshot_read` at the latest
    version; anything else reads as the Hive name-partitioned swap store.
    Lets query-side code accept either store format without caring which
    maintenance protocol produced it."""
    fs = _StoreFS(spark, path)
    if _resolve_tip(fs, path)[0] is not None:
        return snapshot_read(spark, path)
    return read_store(spark, path)


def snapshot_expire(
    spark: SparkSession, path: str, min_ts: float
) -> int | None:
    """Retention commit: drop every sample with ``ts < min_ts``. Files
    whose manifest ``max_ts`` is already below the cutoff are dropped
    WITHOUT ANY DATA SCAN — pure manifest arithmetic at the driver, which
    is the point of carrying per-file ts ranges: steady-state retention on
    an append-mostly store is O(metadata), not O(data). Only files
    STRADDLING the cutoff are read and rewritten filtered; untouched files
    carry over by reference. Expiring EVERYTHING is a legal commit (the
    empty snapshot stays readable via its recorded schema). Returns the
    committed version, or None if nothing was expirable."""
    fs = _StoreFS(spark, path)
    parent, parent_m = _resolve_tip(fs, path)
    if parent is None:
        return None
    base = parent_m["files"]
    # null-stat entries (pre-guard manifests) can never be proven dead —
    # they fall into the straddle set and are read+rewritten, the safe side
    dead = [
        f for f in base if f.get("max_ts") is not None and f["max_ts"] < min_ts
    ]
    _dp = {f["path"] for f in dead}
    straddle = [
        f
        for f in base
        if f["path"] not in _dp
        and (
            f.get("min_ts") is None
            or f.get("max_ts") is None
            or f["min_ts"] < min_ts <= f["max_ts"]
        )
    ]
    if not dead and not straddle:
        return None
    _gone = _dp | {f["path"] for f in straddle}
    kept = [f for f in base if f["path"] not in _gone]
    new_files: list[dict] = []
    schema = parent_m.get("schema")
    if straddle:
        survivors = _pinned_reader(spark, parent_m).parquet(
            *[f["path"] for f in straddle]
        ).filter(F.col("ts") >= min_ts)
        schema = schema or _schema_json(survivors)
        new_files = _write_data_files(
            spark, path, survivors, time_chunk_s=_inherited_chunk(parent_m)
        )
    target = _target_version(fs, path, parent)
    if target is None:
        raise ConcurrentWriteError(
            f"expire prepared against v{parent} but the tip moved"
        )
    manifest = {
        "version": target,
        "parent": parent,
        "operation": "expire",
        "schema": schema,
        "files": kept + new_files,
    }
    if parent_m.get("properties"):
        manifest["properties"] = parent_m["properties"]
    if not _try_commit(fs, path, manifest):
        raise ConcurrentWriteError(
            f"expire prepared against v{parent} but the tip moved"
        )
    return manifest["version"]


def snapshot_delete(
    spark: SparkSession,
    path: str,
    names: list[str] | None = None,
    ts_range: tuple[float, float] | None = None,
) -> int | None:
    """Predicate DELETE (the Delta ``DELETE WHERE`` verb): drop every row
    with ``name ∈ names`` (when given) AND ``ts ∈ [lo, hi]`` (when
    given), by the same manifest arithmetic :func:`snapshot_expire`
    uses for retention — files the stats PROVE fully-matching drop
    without any data scan, files the stats prove disjoint carry over by
    reference, and only predicate-STRADDLING files are read and
    rewritten with the negated row filter (null-stat legacy entries land
    on the rewrite side, the safe one). At 100 TB a targeted delete
    ("remove this leaked metric", "redact one day of one source")
    touches O(matching files), not O(store).

    At least one predicate is required: an unbounded delete is an
    overwrite-with-empty and must be said explicitly. Time travel to
    pre-delete versions still serves the rows (deletes make new
    manifests, never mutate files); ``snapshot_vacuum`` reclaims the
    superseded bytes. Returns the committed version, or None when
    nothing matched."""
    if names is None and ts_range is None:
        raise ValueError(
            "snapshot_delete needs names and/or ts_range — an unbounded "
            "delete is snapshot_write(mode='overwrite') of an empty "
            "frame; say that explicitly"
        )
    fs = _StoreFS(spark, path)
    parent, parent_m = _resolve_tip(fs, path)
    if parent is None:
        return None
    lo, hi = ts_range if ts_range is not None else (None, None)

    def _overlaps(f: dict) -> bool:
        if names is not None and not _name_overlaps(f, names):
            return False
        if ts_range is not None and not _ts_overlaps(f, lo, hi):
            return False
        return True

    def _contained(f: dict) -> bool:
        # every row the file CAN hold matches the predicate (the
        # snapshot_stats containment rule): provable only for
        # single-name files under a names predicate and stat-covered
        # ts ranges
        if names is not None:
            if f.get("min_name") is None or f["min_name"] != f.get("max_name"):
                return False
            if f["min_name"] not in names:
                return False
        if ts_range is not None:
            mn, mx = f.get("min_ts"), f.get("max_ts")
            if mn is None or mx is None or not (lo <= mn and mx <= hi):
                return False
        return True

    base = parent_m["files"]
    # zero-scan drop ONLY for files attested null-key-free at write time:
    # min/max stats ignore NULLs, so a foreign file whose range is fully
    # contained could still hold NULL-key rows — rows the delete predicate
    # can never match. Unattested files fall through to the straddle
    # rewrite, where the null-safe negated filter keeps them row by row.
    dead = [
        f for f in base
        if f.get("null_free") and _overlaps(f) and _contained(f)
    ]
    _dp = {f["path"] for f in dead}
    straddle = [
        f for f in base if f["path"] not in _dp and _overlaps(f)
    ]
    if not dead and not straddle:
        return None
    _gone = _dp | {f["path"] for f in straddle}
    kept = [f for f in base if f["path"] not in _gone]
    new_files: list[dict] = []
    schema = parent_m.get("schema")
    if straddle:
        pred = F.lit(True)
        if names is not None:
            pred = pred & F.col("name").isin(list(names))
        if ts_range is not None:
            pred = pred & F.col("ts").between(lo, hi)
        # null-safe negation: under three-valued logic a NULL name/ts row
        # makes pred NULL, and filter(~NULL) would silently DELETE a row
        # that does not match the predicate. The write path rejects NULL
        # keys, but a foreign (externally-written) file may carry them —
        # a NULL-key row never matches a delete predicate, so it reaches
        # the survivor rewrite, whose commit gate then REFUSES (the store
        # invariant: NULL keys never commit). The re-raise below turns
        # that write-side message into the actionable delete-side one:
        # the store is out of contract and must be repaired first, which
        # beats both silently deleting the row (the pre-fix behavior) and
        # silently committing an invalid store.
        survivors = _pinned_reader(spark, parent_m).parquet(
            *[f["path"] for f in straddle]
        ).filter(~F.coalesce(pred, F.lit(False)))
        schema = schema or _schema_json(survivors)
        try:
            new_files = _write_data_files(
                spark, path, survivors, time_chunk_s=_inherited_chunk(parent_m)
            )
        except ValueError as e:
            if "NULL name" not in str(e):
                raise
            raise ValueError(
                f"snapshot_delete refused: a rewritten file under {path} "
                f"holds NULL/NaN-key row(s) the delete predicate cannot "
                f"match — the store violates the non-null key contract "
                f"(foreign/legacy data file); repair or drop that file "
                f"before deleting. Original: {e}"
            ) from e
    target = _target_version(fs, path, parent)
    if target is None:
        raise ConcurrentWriteError(
            f"delete prepared against v{parent} but the tip moved"
        )
    manifest = {
        "version": target,
        "parent": parent,
        "operation": "delete",
        "schema": schema,
        "files": kept + new_files,
    }
    if parent_m.get("properties"):
        manifest["properties"] = parent_m["properties"]
    if not _try_commit(fs, path, manifest):
        raise ConcurrentWriteError(
            f"delete prepared against v{parent} but the tip moved"
        )
    return manifest["version"]


def snapshot_update(
    spark: SparkSession,
    path: str,
    assignments: dict[str, str],
    names: list[str] | None = None,
    ts_range: tuple[float, float] | None = None,
) -> int | None:
    """Predicate UPDATE (the Delta ``UPDATE ... SET`` verb), completing
    the DML trio next to :func:`snapshot_delete` and the upsert/merge
    verbs: for every row matching ``name ∈ names`` (when given) AND
    ``ts ∈ [lo, hi]`` (when given), apply each ``assignments`` entry
    ``column -> SQL expression`` (evaluated per row with the full row in
    scope, e.g. ``{"value": "value * 2"}``); all other rows pass through
    byte-identical.

    Scale shape mirrors snapshot_delete's rewrite half: files the
    manifest stats prove DISJOINT from the predicate carry over by
    reference (a targeted update touches O(matching files), not
    O(store)); every predicate-intersecting file is read once and
    rewritten with one CASE projection. There is no zero-scan arm — an
    update must materialize new bytes for matching rows by definition.
    The predicate is evaluated null-safely (a NULL-key row in a foreign
    file never matches, and if one reaches a rewrite the no-NULL-keys
    commit gate refuses, as in snapshot_delete). Rewrites go through
    :func:`_write_data_files`, so stats/clustering/chunking are
    recomputed — assignments may legally touch ``name``/``ts`` and the
    manifest stays truthful; assignments that produce NULL/NaN keys are
    refused by the same gate.

    At least one predicate is required (an unbounded update is a
    rewrite of the whole store — say it as read-transform-overwrite).
    Time travel still serves pre-update rows; vacuum reclaims superseded
    bytes. Returns the committed version, or None when no file
    intersects the predicate. Raises :class:`ConcurrentWriteError` if
    the tip moves between resolve and commit (rewrites cannot be rebased
    blindly)."""
    if not assignments:
        raise ValueError("snapshot_update needs at least one assignment")
    if names is None and ts_range is None:
        raise ValueError(
            "snapshot_update needs names and/or ts_range — an unbounded "
            "update is a read-transform-overwrite; say that explicitly"
        )
    fs = _StoreFS(spark, path)
    parent, parent_m = _resolve_tip(fs, path)
    if parent is None:
        return None
    lo, hi = ts_range if ts_range is not None else (None, None)
    schema_cols = [f["name"] for f in (parent_m.get("schema") or {}).get("fields", [])]
    for col in assignments:
        if schema_cols and col not in schema_cols:
            raise ValueError(
                f"snapshot_update: column {col!r} is not in the store "
                f"schema {schema_cols} — UPDATE cannot add columns (use "
                f"merge_schema append for evolution)"
            )

    def _overlaps(f: dict) -> bool:
        if names is not None and not _name_overlaps(f, names):
            return False
        if ts_range is not None and not _ts_overlaps(f, lo, hi):
            return False
        return True

    base = parent_m["files"]
    touched = [f for f in base if _overlaps(f)]
    if not touched:
        return None
    kept = [f for f in base if f["path"] not in {t["path"] for t in touched}]

    pred = F.lit(True)
    if names is not None:
        pred = pred & F.col("name").isin(list(names))
    if ts_range is not None:
        pred = pred & F.col("ts").between(lo, hi)
    pred = F.coalesce(pred, F.lit(False))
    src = _pinned_reader(spark, parent_m).parquet(*[f["path"] for f in touched])
    # schema-less manifests (legacy/foreign stores) validate against the
    # READ columns instead — otherwise a typo'd assignment column would
    # silently rewrite every touched file byte-identically and commit a
    # version that changed nothing
    if not schema_cols:
        unknown = sorted(set(assignments) - set(src.columns))
        if unknown:
            raise ValueError(
                f"snapshot_update: column(s) {unknown} are not in the "
                f"store's columns {sorted(src.columns)} — UPDATE cannot "
                f"add columns"
            )
    out_cols = [
        F.when(pred, F.expr(expr)).otherwise(F.col(c)).alias(c)
        if (expr := assignments.get(c)) is not None
        else F.col(c)
        for c in src.columns
    ]
    rewritten = src.select(*out_cols)
    schema = parent_m.get("schema") or _schema_json(rewritten)
    try:
        new_files = _write_data_files(
            spark, path, rewritten, time_chunk_s=_inherited_chunk(parent_m)
        )
    except ValueError as e:
        if "NULL name" not in str(e):
            raise
        # the snapshot_delete rule: point the operator at the real
        # artifact (an out-of-contract store file or a key-NULLing
        # assignment), not a non-existent "batch"
        raise ValueError(
            f"snapshot_update refused: the rewrite under {path} produced "
            f"or preserved NULL/NaN-key row(s) — either an assignment "
            f"NULLs a key column or a foreign/legacy data file violates "
            f"the non-null key contract; fix the assignment or repair the "
            f"file. Original: {e}"
        ) from e
    target = _target_version(fs, path, parent)
    if target is None:
        raise ConcurrentWriteError(
            f"update prepared against v{parent} but the tip moved"
        )
    manifest = {
        "version": target,
        "parent": parent,
        "operation": "update",
        "schema": schema,
        "files": kept + new_files,
    }
    if parent_m.get("properties"):
        manifest["properties"] = parent_m["properties"]
    if not _try_commit(fs, path, manifest):
        raise ConcurrentWriteError(
            f"update prepared against v{parent} but the tip moved"
        )
    return manifest["version"]


def snapshot_diff(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int,
) -> DataFrame:
    """Semantic row diff between two committed versions (the
    ``table_changes(v1, v2)`` analog that also covers REWRITES — the
    change feed serves pure appends; this verb answers "what changed"
    across delete/update/upsert/merge/compaction history): every data
    column of ``to_version`` not in ``from_version`` as
    ``_change='insert'`` and the reverse as ``_change='delete'``, as a
    MULTISET diff (k extra copies of an identical row report k changes;
    an UPDATE appears as its delete+insert pair).

    Scale shape — file-aware first, rows second: files present in BOTH
    manifests (carried by reference across commits) cancel exactly and
    are never read; only the symmetric difference of the file lists
    scans. Row-level cancellation then runs as ONE hash aggregate
    grouped on the rows' EXACT canonical identity — per column a
    (null-flag, value-string) pair; no lossy 64-bit pre-hash whose
    collisions could cancel a real change — counting per side and
    emitting the surplus: compaction-style rewrites that only re-binned
    rows cancel to an empty diff without any join. Rows explode back
    with ``explode(sequence)`` per surplus count; no driver
    materialization anywhere. Reads use the schema of the NEWER of the
    two versions (under additive-only evolution that is the superset,
    so a reverse diff across an evolution sees the evolved columns and
    stays the exact label-swap of the forward diff)."""
    fs = _StoreFS(spark, path)
    m_from = _read_manifest(fs, path, from_version)
    m_to = _read_manifest(fs, path, to_version)
    files_from = {f["path"] for f in m_from["files"]}
    files_to = {f["path"] for f in m_to["files"]}
    only_from = sorted(files_from - files_to)
    only_to = sorted(files_to - files_from)
    # the NEWER version's schema is the superset under additive-only
    # evolution — reading both sides with it keeps reverse diffs exact
    m_new = m_to if to_version >= from_version else m_from
    m_old = m_from if to_version >= from_version else m_to
    schema_m = m_new.get("schema") or m_old.get("schema")
    from pyspark.sql import types as T

    if schema_m is None:
        raise ValueError(
            f"snapshot_diff needs a recorded schema on v{from_version} or "
            f"v{to_version} of {path} (pre-schema legacy manifests cannot "
            f"diff deterministically across heterogeneous files)"
        )
    schema = T.StructType.fromJson(schema_m)
    reserved = {"_d", "_net", "_row", "_n", "_change"} | {
        f"_hf{i}" for i in range(len(schema.fields))
    } | {f"_hv{i}" for i in range(len(schema.fields))}
    clash = reserved & {f.name for f in schema.fields}
    if clash:
        raise ValueError(
            f"snapshot_diff: store columns {sorted(clash)} clash with the "
            f"diff's working/output columns"
        )
    # fresh StructType — StructType.add MUTATES in place (the round-8
    # pyds finding), which would smuggle a phantom _change column into
    # the data-read schema below
    out_schema = T.StructType(
        list(schema.fields) + [T.StructField("_change", T.StringType())]
    )
    if not only_from and not only_to:
        return spark.createDataFrame([], out_schema)

    def side(paths: list[str], delta: int) -> DataFrame:
        if not paths:
            return None
        df = spark.read.schema(schema).parquet(*paths)
        return df.withColumn("_d", F.lit(delta))

    cols = [f.name for f in schema.fields]
    frames = [s for s in (side(only_to, 1), side(only_from, -1)) if s is not None]
    both = frames[0] if len(frames) == 1 else frames[0].unionByName(frames[1])
    # MAP columns cannot be grouping keys — group on the canonical
    # per-row identity instead and keep one exemplar row per group
    # (identical rows are interchangeable by definition of the multiset)
    def _cell(c: str):
        dt = schema[c].dataType
        if isinstance(dt, (T.MapType, T.ArrayType, T.StructType)):
            return F.to_json(F.col(c))
        if isinstance(dt, T.BinaryType):
            # cast-to-string would lossily UTF-8-decode (distinct payloads
            # collapsing onto replacement characters); base64 is injective
            return F.base64(F.col(c))
        return F.col(c).cast("string")

    # per column: (is-null flag, value-as-string) - the flag keeps NULL
    # distinct from any real string without a collidable sentinel; the
    # double->string cast is Java shortest-roundtrip (injective). The
    # grouping key is the EXACT identity tuple, not a 64-bit hash of it
    # - at billions of rows a birthday collision between a from-row and
    # a to-row would silently cancel a real change out of the diff.
    ident_cols = []
    for i, c in enumerate(cols):
        ident_cols.append(F.col(c).isNull().cast("int").alias(f"_hf{i}"))
        ident_cols.append(F.coalesce(_cell(c), F.lit("")).alias(f"_hv{i}"))
    key_names = [e for i in range(len(cols)) for e in (f"_hf{i}", f"_hv{i}")]
    agg = (
        both.select(*ident_cols, F.struct(*cols).alias("_row"), "_d")
        .groupBy(*key_names)
        .agg(
            F.sum("_d").alias("_net"),
            F.first("_row").alias("_row"),
        )
        .filter(F.col("_net") != 0)
    )
    return agg.select(
        F.col("_row.*"),
        F.when(F.col("_net") > 0, F.lit("insert"))
        .otherwise(F.lit("delete"))
        .alias("_change"),
        F.explode(
            F.sequence(F.lit(1), F.abs(F.col("_net")).cast("int"))
        ).alias("_n"),
    ).drop("_n")


def snapshot_vacuum(
    spark: SparkSession,
    path: str,
    keep_last: int = 1,
    min_age_s: float = 24 * 3600.0,
) -> list[str]:
    """Reclaim storage: drop all but the last ``keep_last`` manifests and
    delete every data file (and empty tx dir) no kept manifest references.
    This is the ONLY operation that deletes data, and it only deletes what
    no committed-and-kept snapshot can reach.

    ``min_age_s`` is the in-flight-writer guard (the same reason Delta's
    VACUUM has a retention window): a writer that has staged data files
    but not yet committed its manifest looks exactly like a crashed
    orphan, so unreferenced files YOUNGER than the threshold are left
    alone — only files old enough that no live transaction can still be
    about to reference them are reclaimed. Lower it (or pass 0) only when
    no writer can be active. Returns deleted paths."""
    import time

    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    if min_age_s < 0:
        raise ValueError(f"min_age_s must be >= 0, got {min_age_s}")
    fs = _StoreFS(spark, path)
    versions = _list_versions(fs, path)
    if not versions:
        return []
    readable = [v for v in versions if _readable(fs, path, v)]
    if not readable:
        # every manifest is torn/tampered — exactly the state readers are
        # built to survive and an operator can repair. An empty live set
        # here would delete every manifest and (past min_age_s) every data
        # file: vacuum must never turn a repairable store into data loss.
        return []
    kept_versions = set(readable[-keep_last:])

    def norm(p: str) -> str:
        # input_file_name() says file:///x, FS listings say file:/x —
        # compare the URI path component only
        return str(fs.jpath(p).toUri().getPath())

    live_norm: set[str] = set()
    for v in kept_versions:
        live_norm.update(norm(f["path"]) for f in _read_manifest(fs, path, v)["files"])
    deleted: list[str] = []
    # delete only BELOW the kept floor — never a slot BETWEEN kept
    # versions (only unreadable junk can sit there): deleting it would
    # punch a gap into the contiguous slot sequence that the tip-hint
    # probe-forward in _resolve_tip relies on, letting a stale hint stop
    # at the gap and resolve a pre-gap version as the tip (review
    # finding: stale reads AND a forked commit parented before the real
    # tip). Retained junk slots are invisible to readers and writers
    # skip them deterministically.
    floor = min(kept_versions, default=versions[-1] + 1)
    for v in versions:
        if v < floor:
            fs.delete(_manifest_path(path, v))
            deleted.append(_manifest_path(path, v))
    cutoff_ms = (time.time() - min_age_s) * 1000.0
    # stale manifest temps: a writer that crashed between staging and
    # rename leaves .tmp_v*.json junk (harmless — invisible to version
    # listing — but it accumulates); reclaim it under the same age guard
    snap_dir = f"{path}/{_SNAP_DIR}"
    if fs.exists(snap_dir):
        for st in fs.fs.listStatus(fs.jpath(snap_dir)):
            base = str(st.getPath()).rsplit("/", 1)[-1]
            if base.startswith(".tmp_") and st.getModificationTime() <= cutoff_ms:
                fs.delete(str(st.getPath()))
                deleted.append(str(st.getPath()))
    data_root = f"{path}/data"
    if fs.exists(data_root):
        for tx in fs.subdirs(data_root):
            files = fs.parquet_files(tx)
            dead = []
            for p, _sz in files:
                if norm(p) in live_norm:
                    continue
                mtime = fs.fs.getFileStatus(fs.jpath(p)).getModificationTime()
                if mtime <= cutoff_ms:
                    dead.append(p)
            for p in dead:
                fs.delete(p)
                deleted.append(p)
            if files and len(dead) == len(files):
                fs.delete(tx)  # tx dir fully unreferenced
    return deleted


def _readable(fs: _StoreFS, root: str, version: int) -> bool:
    try:
        _read_manifest(fs, root, version)
        return True
    except Exception:
        return False
