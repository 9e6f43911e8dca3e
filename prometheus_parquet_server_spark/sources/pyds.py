"""Spark 4 Python Data Source over the snapshot store.

Registers the snapshot store (``sources/snapshot_store.py``) as a
first-class ``spark.read.format(...)`` source via the public
``pyspark.sql.datasource`` API, so the table format plugs into the
standard reader/readStream surface instead of requiring the library's
own ``snapshot_read`` entry points:

    from prometheus_parquet_server_spark.sources.pyds import (
        register_snapshot_source)
    register_snapshot_source(spark)
    df = spark.read.format("pps_snapshot").load(store_path)
    live = spark.readStream.format("pps_snapshot").load(store_path)

Batch read
    * ``version`` option time-travels exactly like ``snapshot_read``.
    * ``pushFilters`` receives Catalyst's typed filters; equality / IN
      on ``name`` and range comparisons on ``ts`` drive MANIFEST-level
      file pruning (min/max stats recorded at commit time — no footer
      is opened for a pruned file). Every filter is yielded back as
      unhandled, so Spark re-applies the exact row-level predicate:
      pruning is a conservative plan optimization, never a semantics
      change.
    * one :class:`InputPartition` per surviving data file; ``read``
      yields pyarrow record batches (Arrow transfer, not row tuples).

Streaming read (the version tail)
    The store's commit log doubles as a change feed — the same public
    pattern as Delta's streaming source. Offsets are manifest versions;
    each micro-batch delivers the files ADDED by commits in
    ``(start, end]``:

    * ``append`` commits deliver ``files(v) − files(parent)``;
    * data-preserving / data-removing maintenance (``compact``,
      ``expire``) delivers nothing — no new rows exist;
    * row-rewriting commits (``overwrite`` / ``upsert`` / ``merge``)
      RAISE by default. With ``ignore_changes=true`` their new files
      are delivered whole — which re-delivers rewritten old rows
      alongside genuinely new ones. That is the public Delta
      ``ignoreChanges`` contract: at-least-once on updated rows,
      never silent loss.
    * ``starting_version`` option: ``latest`` tails only commits made
      after the stream starts; an integer N replays from version N
      (inclusive). Default replays the full history from v1, so the
      first micro-batch carries the initial table content.

    Offsets checkpoint as ``{"version": N}``; ``partitions(start,
    end)`` is a pure function of the immutable manifests, so recovery
    after a crash re-plans the identical batch (exactly-once with an
    idempotent sink, e.g. ``snapshot_write(txn=...)``).

Scale notes: planning reads only the JSON manifests (driver-side,
O(files) smallness); executors touch exactly the surviving parquet
files and stream them as Arrow batches. The Python worker hop costs
more per byte than the JVM parquet scan — ``snapshot_select`` remains
the hot serving path; this source buys the standard-API integration
and the incremental change-feed consumption the native path lacks.

Reference parity: the reference server has no table format or change
feed (its store is a directory of parquet files, src/metricstore.rs);
this module is part of the beyond-reference storage layer SURVEY §2.1
documents.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

_SNAP_DIR = "_snapshots"

# ---------------------------------------------------------------------------
# Spark-free manifest access. DataSource planning runs in a Python worker
# process with no JVM handle, so the Hadoop-FS helpers in snapshot_store
# are unusable here; local (and file:) URIs go through plain os/open,
# anything else through pyarrow.fs (S3/HDFS/GCS support rides pyarrow's
# own bindings when present).
# ---------------------------------------------------------------------------


def _local_path(uri: str) -> str | None:
    """file:/x, file:///x, or a bare path → the POSIX path; None when the
    URI needs a non-local filesystem."""
    if "://" not in uri and not uri.startswith("file:"):
        return uri
    if uri.startswith("file:"):
        rest = uri[len("file:") :]
        return "/" + rest.lstrip("/")
    return None


def _list_versions(root: str) -> list[int]:
    snap = f"{root}/{_SNAP_DIR}"
    lp = _local_path(snap)
    if lp is not None:
        try:
            names = os.listdir(lp)
        except FileNotFoundError:
            return []
    else:
        from pyarrow import fs as pafs

        afs, p = pafs.FileSystem.from_uri(snap)
        sel = pafs.FileSelector(p, allow_not_found=True)
        names = [fi.base_name for fi in afs.get_file_info(sel)]
    out = []
    for base in names:
        if base.startswith("v") and base.endswith(".json"):
            try:
                out.append(int(base[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _read_manifest(root: str, version: int) -> dict:
    path = f"{root}/{_SNAP_DIR}/v{version:010d}.json"
    lp = _local_path(path)
    if lp is not None:
        with open(lp, "rb") as fh:
            return json.loads(fh.read().decode("utf-8"))
    from pyarrow import fs as pafs

    afs, p = pafs.FileSystem.from_uri(path)
    with afs.open_input_stream(p) as stream:
        return json.loads(stream.read().decode("utf-8"))


def _resolve_tip(root: str) -> tuple[int | None, dict | None]:
    """(version, manifest) of the highest READABLE version — same
    torn-manifest tolerance as snapshot_store._resolve_tip."""
    for v in reversed(_list_versions(root)):
        try:
            return v, _read_manifest(root, v)
        except Exception:
            continue
    return None, None


# Overlap predicates mirror snapshot_store._name_overlaps/_ts_overlaps:
# null stats always intersect (read-and-filter beats a wedged plan).


def _name_overlaps(f: dict, names) -> bool:
    if f.get("min_name") is None or f.get("max_name") is None:
        return True
    return any(f["min_name"] <= n <= f["max_name"] for n in names)


def _ts_overlaps(f: dict, lo: float, hi: float) -> bool:
    mn, mx = f.get("min_ts"), f.get("max_ts")
    if mn is None or mx is None:
        return True
    return not (mx < lo or mn > hi)


def _prune(files: list[dict], names, ts_lo: float, ts_hi: float) -> list[dict]:
    out = files
    if names is not None:
        out = [f for f in out if _name_overlaps(f, names)]
    if ts_lo > float("-inf") or ts_hi < float("inf"):
        out = [f for f in out if _ts_overlaps(f, ts_lo, ts_hi)]
    return out


def _extract_bounds(filters):
    """(names | None, ts_lo, ts_hi) from Catalyst's typed pushdown
    filters. Only top-level ``name`` / ``ts`` predicates narrow the
    plan; everything else is ignored here and re-applied by Spark.
    EqualTo(NaN) never arrives (Catalyst folds NaN comparisons), and
    the bounds only ever SHRINK the candidate range, so an unrecognized
    shape degrades to a full-file-list scan, not a wrong answer."""
    names = None
    ts_lo, ts_hi = float("-inf"), float("inf")
    for f in filters:
        attr = getattr(f, "attribute", None)
        if attr == ("name",):
            if isinstance(f, EqualTo) and isinstance(f.value, str):
                names = [f.value] if names is None else [
                    n for n in names if n == f.value
                ]
            elif isinstance(f, In) and all(
                isinstance(v, str) for v in f.value
            ):
                vs = list(f.value)
                names = vs if names is None else [n for n in names if n in vs]
        elif attr == ("ts",):
            v = getattr(f, "value", None)  # e.g. IsNotNull carries none
            if not isinstance(v, (int, float)) or v != v:
                continue
            if isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                ts_lo = max(ts_lo, float(v))
            elif isinstance(f, (LessThan, LessThanOrEqual)):
                ts_hi = min(ts_hi, float(v))
            elif isinstance(f, EqualTo):
                ts_lo = max(ts_lo, float(v))
                ts_hi = min(ts_hi, float(v))
    return names, ts_lo, ts_hi


class _FilePartition(InputPartition):
    """One immutable data file. Carries only what read() needs — the
    partition pickles to executors."""

    def __init__(self, path: str):
        self.path = path


def _read_file(path: str, columns: list[str]) -> Iterator:
    """Stream one parquet file as Arrow batches with columns in Spark's
    schema order (the DS contract matches by position)."""
    import pyarrow.parquet as pq

    lp = _local_path(path)
    if lp is not None:
        table = pq.read_table(lp, columns=columns)
    else:
        from pyarrow import fs as pafs

        afs, p = pafs.FileSystem.from_uri(path)
        table = pq.read_table(p, columns=columns, filesystem=afs)
    yield from table.select(columns).to_batches()


# ---------------------------------------------------------------------------
# Batch
# ---------------------------------------------------------------------------


class SnapshotBatchReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self._columns = [f.name for f in schema.fields]
        self._root = options.get("path")
        if not self._root:
            raise ValueError("pps_snapshot: a store path is required")
        v = options.get("version")
        self._version = int(v) if v is not None else None
        self._names = None
        self._ts_lo, self._ts_hi = float("-inf"), float("inf")

    def pushFilters(self, filters):
        self._names, self._ts_lo, self._ts_hi = _extract_bounds(filters)
        # everything is re-applied by Spark — stat pruning is conservative
        yield from filters

    def partitions(self):
        if self._version is None:
            _, m = _resolve_tip(self._root)
            if m is None:
                raise FileNotFoundError(
                    f"no committed snapshot under {self._root}"
                )
        else:
            m = _read_manifest(self._root, self._version)
        files = _prune(m["files"], self._names, self._ts_lo, self._ts_hi)
        # Spark requires ≥1 partition; an empty store/prune reads nothing
        return [_FilePartition(f["path"]) for f in files] or [
            _FilePartition("")
        ]

    def read(self, partition):
        if not partition.path:
            return
        yield from _read_file(partition.path, self._columns)


# ---------------------------------------------------------------------------
# Streaming (version tail / change feed)
# ---------------------------------------------------------------------------


class SnapshotStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options):
        self._columns = [f.name for f in schema.fields]
        self._root = options.get("path")
        if not self._root:
            raise ValueError("pps_snapshot: a store path is required")
        self._starting = options.get("starting_version")
        self._ignore_changes = str(
            options.get("ignore_changes", "false")
        ).lower() in ("true", "1", "yes")

    def initialOffset(self) -> dict:
        if self._starting is None:
            return {"version": 0}  # replay from v1: first batch = table
        if str(self._starting).lower() == "latest":
            tip, _ = _resolve_tip(self._root)
            return {"version": tip or 0}
        return {"version": max(0, int(self._starting) - 1)}

    def latestOffset(self) -> dict:
        tip, _ = _resolve_tip(self._root)
        return {"version": tip or 0}

    def _delta_files(self, v: int) -> list[str]:
        """Paths ADDED by version v, per the module contract above."""
        try:
            m = _read_manifest(self._root, v)
        except Exception:
            return []  # junk slot (torn legacy write) — never readable
        op = m.get("operation", "append")
        if op in ("compact", "expire"):
            return []  # rewrites/removes existing rows; nothing new
        initial = op == "overwrite" and m.get("parent") is None
        if op != "append" and not initial and not self._ignore_changes:
            # upsert / merge / non-initial overwrite (or an op this reader
            # predates) rewrite rows — fail loudly rather than guess
            raise RuntimeError(
                f"pps_snapshot stream: version {v} is a row-rewriting "
                f"'{op}' commit; restart with option ignore_changes=true "
                f"to deliver its new files (re-delivers rewritten rows) "
                f"or reprocess the store as a batch"
            )
        parent = m.get("parent")
        if parent is None:
            return [f["path"] for f in m["files"]]
        try:
            pm = _read_manifest(self._root, parent)
        except Exception as e:
            raise RuntimeError(
                f"pps_snapshot stream: parent manifest v{parent} of v{v} "
                f"is unreadable (expired under a lagging stream?) — "
                f"cannot compute the added-file delta"
            ) from e
        seen = {f["path"] for f in pm["files"]}
        return [f["path"] for f in m["files"] if f["path"] not in seen]

    def partitions(self, start: dict, end: dict):
        paths: list[str] = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            paths.extend(self._delta_files(v))
        return [_FilePartition(p) for p in paths] or [_FilePartition("")]

    def read(self, partition):
        if not partition.path:
            return
        yield from _read_file(partition.path, self._columns)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the sink checkpoint; nothing to release

    def stop(self) -> None:
        pass


# ---------------------------------------------------------------------------
# DataSource
# ---------------------------------------------------------------------------


class SnapshotDataSource(DataSource):
    """``format("pps_snapshot")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "pps_snapshot"

    def schema(self) -> StructType:
        root = self.options.get("path")
        if not root:
            raise ValueError("pps_snapshot: a store path is required")
        v = self.options.get("version")
        if v is not None:
            m = _read_manifest(root, int(v))
        else:
            _, m = _resolve_tip(root)
            if m is None:
                raise FileNotFoundError(f"no committed snapshot under {root}")
        if m.get("schema") is not None:
            return StructType.fromJson(m["schema"])
        # pre-schema manifest (external tooling): borrow a footer
        if m["files"]:
            import pyarrow.parquet as pq

            from pyspark.sql.pandas.types import from_arrow_schema

            lp = _local_path(m["files"][0]["path"])
            return from_arrow_schema(pq.read_schema(lp))
        raise FileNotFoundError(
            f"snapshot of {root} is empty and predates recorded schemas"
        )

    def reader(self, schema: StructType) -> SnapshotBatchReader:
        return SnapshotBatchReader(schema, self.options)

    def streamReader(self, schema: StructType) -> SnapshotStreamReader:
        return SnapshotStreamReader(schema, self.options)


def register_snapshot_source(spark) -> None:
    """Idempotently register ``format('pps_snapshot')`` on a session and
    enable Python-source filter pushdown (off by default in Spark 4.1;
    without it an implemented ``pushFilters`` is an analysis error, and
    with it the manifest pruning actually engages)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SnapshotDataSource)
