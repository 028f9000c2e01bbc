"""Python DataSource (Spark 4 DataSource API): the snapshot table as a
first-class ``spark.read.format("snapshot")`` source.

This is the DataSource-V2 face of ``operators.lifecycle.SnapshotTable`` —
the reference reads its Iceberg tables through an engine-integrated table
format (SURVEY §2.1 S5); this source gives our snapshot layer the same
integration, through Spark's public Python DataSource API:

- **schema** inferred from the current snapshot's Parquet footer (the
  ``INFER_SCHEMA`` external-table behavior, performance_comparison.sql:14-21);
- **split planning** = one ``InputPartition`` per manifest data file —
  the scan parallelizes across files exactly as Iceberg plans splits;
- **filter pushdown** (``pushFilters``): comparison predicates prune whole
  files against footer min/max stats before any data read — Iceberg's
  manifest-stats planning walk (aws-community-builders-presentation.md:
  247-258) running *inside* the source. All filters are also returned as
  unhandled so Spark re-applies them row-level (pruning is an
  optimization, never a semantics change);
- **time travel** via ``option("version", N)`` / ``option("asOf", ts)``
  (T4 — ``VERSION AS OF`` / ``TIMESTAMP AS OF``);
- **reads** stream Arrow record batches (the vectorized path, no
  row-by-row Python).

Register once per session with :func:`register`.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

FORMAT_NAME = "snapshot"


def register(spark) -> None:
    """Register the ``snapshot`` format on this session (idempotent).

    - Enables Python-datasource filter pushdown (runtime SQL conf,
      default-off in Spark 4.1) — without it Spark refuses a reader that
      implements ``pushFilters``.
    - Registers THIS module for cloudpickle by-value serialization: the
      DataSource class is unpickled in Spark's plan-time Python runner and
      in executor workers, which do not inherit the driver's sys.path —
      by-value shipping makes the source work from any session (the
      external driver's vanilla session included) with no PYTHONPATH
      arrangement. Everything the shipped code touches is stdlib/
      pyarrow/pyspark, importable everywhere.
    """
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SnapshotDataSource)


def _resolve_version(path: str, options) -> int:
    """Snapshot-version resolution (``version``/``asof`` options, else
    latest) — shared by the file walk and the bloom-sidecar lookup."""
    import json

    snap_dir = os.path.join(path, "snapshots")
    snaps = sorted(
        (f for f in os.listdir(snap_dir) if f.startswith("v") and f.endswith(".json")),
        key=lambda f: int(f[1:-5]),
    )
    if not snaps:
        raise ValueError(f"no snapshots under {path}")

    def manifest(v: int) -> dict:
        with open(os.path.join(snap_dir, f"v{v}.json")) as fh:
            return json.load(fh)

    if options.get("tag") is not None:
        # named immutable ref (Iceberg: VERSION AS OF 'tagname' resolves
        # through the refs table) — written by SnapshotTable.create_tag
        tp = os.path.join(snap_dir, f"tag-{options['tag']}.json")
        if not os.path.exists(tp):
            raise ValueError(f"unknown tag {options['tag']!r}")
        with open(tp) as fh:
            return int(json.load(fh)["version"])
    if options.get("version") is not None:
        return int(options["version"])
    if options.get("asof") is not None:
        as_of = float(options["asof"])
        versions = [
            m["version"]
            for m in (manifest(int(f[1:-5])) for f in snaps)
            if m["timestamp"] <= as_of
        ]
        if not versions:
            raise ValueError(f"no snapshot at or before {as_of}")
        return max(versions)
    return int(snaps[-1][1:-5])


def _resolve_files(path: str, options) -> list[str]:
    """Manifest walk (inline — the serialized planner code must not import
    this package): pick the snapshot version from ``version``/``asof``
    options, return its data-file paths. Mirrors
    ``operators.lifecycle.SnapshotTable`` exactly."""
    import json

    version = _resolve_version(path, options)
    with open(os.path.join(path, "snapshots", f"v{version}.json")) as fh:
        manifest = json.load(fh)
    return [os.path.join(path, "data", f) for f in manifest["files"]]


# Bloom sidecar hash family — MUST equal operators.lifecycle's BLOOM_*
# (test-pinned; duplicated here because the plan-time runner executes this
# module serialized by value, without the package on its path)
_BLOOM_M = 65536
_BLOOM_P = 1_000_000_007
_BLOOM_A = (2654435761, 2246822519, 3266489917, 668265263)
_BLOOM_B = (1, 7, 31, 127)


def _bloom_index(path: str, version: int, column: str) -> dict | None:
    """The snapshot-pinned Bloom sidecar for ``column`` (written by
    ``SnapshotTable.build_bloom_index``), as {basename: set(positions)} —
    or None when the table carries no bloom for that column (planning
    then stays footer-stats only)."""
    import json

    p = os.path.join(path, "snapshots", f"bloom_v{version}_{column}.json")
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return {f: set(ps) for f, ps in json.load(fh).items()}


@dataclass
class _FileSplit(InputPartition):
    path: str


def _footer_min_max(path: str, column: str):
    """(min, max) for ``column`` from the file footer, or None if any row
    group lacks stats (stat-less files must never be pruned)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    if column not in md.schema.names:
        return None
    idx = md.schema.names.index(column)
    mins, maxs = [], []
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            return None
        mins.append(st.min)
        maxs.append(st.max)
    return min(mins), max(maxs)


def _file_survives(path: str, flt: Filter) -> bool:
    """Footer-stats pruning decision for one comparison filter. Returns
    True (keep the file) whenever the filter shape, the column, or the
    value types are not safely comparable — pruning must be sound."""
    if isinstance(flt, IsNotNull):
        return True  # null-count pruning would need per-file row counts
    if not isinstance(
        flt, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
    ):
        return True
    if len(flt.attribute) != 1:  # nested column
        return True
    bounds = _footer_min_max(path, flt.attribute[0])
    if bounds is None:
        return True
    lo, hi = bounds
    v = flt.value
    try:
        if isinstance(flt, EqualTo):
            return lo <= v <= hi
        if isinstance(flt, GreaterThan):
            return hi > v
        if isinstance(flt, GreaterThanOrEqual):
            return hi >= v
        if isinstance(flt, LessThan):
            return lo < v
        return lo <= v
    except TypeError:  # incomparable types (e.g. tz-aware vs naive)
        return True


class SnapshotReader(DataSourceReader):
    def __init__(self, options):
        self._path = options["path"]
        self._version = _resolve_version(self._path, options)
        self._files = _resolve_files(self._path, options)

    def _bloom_excludes(self, filters) -> set:
        """Files a Bloom sidecar PROVES cannot satisfy some EqualTo filter
        (all k probe positions must be set; integer values only — the
        sidecar's domain). Min/max footer pruning cannot make this call on
        an unclustered column; the sidecar can."""
        out: set = set()
        for flt in filters:
            if not isinstance(flt, EqualTo) or len(flt.attribute) != 1:
                continue
            if not isinstance(flt.value, int) or isinstance(flt.value, bool):
                continue
            idx = _bloom_index(self._path, self._version, flt.attribute[0])
            if idx is None:
                continue
            need = {
                ((a * flt.value + b) % _BLOOM_P) % _BLOOM_M
                for a, b in zip(_BLOOM_A, _BLOOM_B)
            }
            for path in self._files:
                base = os.path.basename(path)
                if base in idx and not need <= idx[base]:
                    out.add(path)
        return out

    def pushFilters(self, filters):
        filters = list(filters)
        bloomed = self._bloom_excludes(filters)
        kept = []
        for path in self._files:
            if path in bloomed:
                continue
            if all(_file_survives(path, f) for f in filters):
                kept.append(path)
        self._files = kept
        # every filter is re-applied by Spark row-level: file pruning is
        # a planning optimization, not filter ownership
        return filters

    def partitions(self):
        return [_FileSplit(p) for p in self._files]

    def read(self, partition: _FileSplit):
        import pyarrow.parquet as pq

        with pq.ParquetFile(partition.path) as f:
            yield from f.iter_batches()


def _all_commits(path: str) -> list[dict]:
    """Every commit manifest, oldest first."""
    import json

    snap_dir = os.path.join(path, "snapshots")
    out = []
    for f in sorted(
        (f for f in os.listdir(snap_dir) if f.startswith("v") and f.endswith(".json")),
        key=lambda f: int(f[1:-5]),
    ):
        with open(os.path.join(snap_dir, f)) as fh:
            out.append(json.load(fh))
    return out


class SnapshotStreamReader(DataSourceStreamReader):
    """Micro-batch stream of snapshot COMMITS (offset = snapshot version):
    each batch reads exactly the data files added by append commits in
    (start, end] — the Iceberg incremental append scan, so a downstream
    streaming query processes every ingested row exactly once across
    restarts (offsets live in the sink's checkpoint)."""

    def __init__(self, options):
        self._path = options["path"]

    def initialOffset(self) -> dict:
        return {"version": 0}

    def latestOffset(self) -> dict:
        commits = _all_commits(self._path)
        return {"version": commits[-1]["version"] if commits else 0}

    def partitions(self, start: dict, end: dict):
        # `prev` accumulates across ALL commits (a compaction's rewritten
        # file must not look "added" by the next append — its rows already
        # streamed from the original files); only append commits in
        # (start, end] contribute splits. Iceberg's incremental append
        # scan makes the same replace-vs-append distinction.
        prev: set = set()
        splits = []
        for m in _all_commits(self._path):
            added = [f for f in m["files"] if f not in prev]
            prev.update(m["files"])
            if (
                m["operation"] == "append"
                and start["version"] < m["version"] <= end["version"]
            ):
                splits.extend(
                    _FileSplit(os.path.join(self._path, "data", f)) for f in added
                )
        return splits

    def read(self, partition: _FileSplit):
        import pyarrow.parquet as pq

        with pq.ParquetFile(partition.path) as f:
            yield from f.iter_batches()

    def commit(self, end: dict) -> None:
        pass  # offsets are tracked by the engine's checkpoint


@dataclass
class _FilesWritten(WriterCommitMessage):
    files: list


class SnapshotArrowWriter(DataSourceArrowWriter):
    """``df.write.format("snapshot")`` — each task streams its Arrow
    batches into one data file (named with a uuid, invisible until
    commit); the driver-side ``commit()`` writes the manifest in one
    atomic rename. Exactly the two-phase Iceberg commit protocol
    (P:205-224): data files first, metadata pointer swap last, so a
    failed job leaves only unreferenced files for orphan GC. ``abort()``
    deletes the task outputs eagerly."""

    def __init__(self, path: str, overwrite: bool):
        self._path = path
        self._overwrite = overwrite
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        os.makedirs(os.path.join(path, "snapshots"), exist_ok=True)

    def write(self, iterator):
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        batches = list(iterator)
        if not batches:
            return _FilesWritten(files=[])
        name = f"{uuid.uuid4().hex[:12]}.parquet"
        tbl = pa.Table.from_batches(batches)
        pq.write_table(tbl, os.path.join(self._path, "data", name))
        return _FilesWritten(files=[name])

    def commit(self, messages):
        # CAS commit loop, same protocol as SnapshotTable._try_commit
        # (implemented inline: this module is cloudpickle-shipped by value
        # and must stay free of package imports). os.link fails with
        # FileExistsError when the version was taken — re-read, re-base
        # the file list, retry; no concurrent append is ever dropped.
        import json
        import time as _time
        import uuid as _uuid

        added = [f for m in messages if m is not None for f in m.files]
        snap_dir = os.path.join(self._path, "snapshots")
        for _ in range(1000):
            commits = _all_commits(self._path)
            version = (commits[-1]["version"] + 1) if commits else 1
            prev = (
                []
                if (self._overwrite or not commits)
                else commits[-1]["files"]
            )
            manifest = {
                "version": version,
                "operation": "overwrite" if self._overwrite else "append",
                "timestamp": _time.time(),
                "files": prev + added,
            }
            tmp = os.path.join(
                snap_dir, f".commit-{_uuid.uuid4().hex[:8]}.tmp"
            )
            with open(tmp, "w") as fh:
                json.dump(manifest, fh)
            try:
                os.link(tmp, os.path.join(snap_dir, f"v{version}.json"))
                return
            except FileExistsError:
                continue  # lost the race: re-base on the winner
            finally:
                os.unlink(tmp)
        raise RuntimeError("snapshot write: commit retries exhausted")

    def abort(self, messages):
        for m in messages:
            if m is None:
                continue
            for f in m.files:
                try:
                    os.remove(os.path.join(self._path, "data", f))
                except OSError:
                    pass


class SnapshotDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema

        files = _resolve_files(self.options["path"], self.options)
        if not files:
            raise ValueError("empty snapshot table")
        return from_arrow_schema(pq.read_schema(files[0]))

    def reader(self, schema) -> SnapshotReader:
        return SnapshotReader(self.options)

    def streamReader(self, schema) -> SnapshotStreamReader:
        return SnapshotStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> SnapshotArrowWriter:
        return SnapshotArrowWriter(self.options["path"], overwrite)


# --- driver-contract gate -----------------------------------------------------
def pyds_snapshot_scan(spark, sf_dir: str):
    """End-to-end through the registered format: build a 4-file snapshot
    table clustered by user_id, read it back via
    ``spark.read.format("snapshot")`` with a user_id range predicate —
    Spark pushes the comparisons into ``pushFilters``, the source prunes
    files on footer stats, Spark re-applies the filter row-level — then
    aggregate per event_type. The oracle recomputes from the raw events,
    so an unsound pruning decision surfaces as missing rows."""
    import tempfile

    from pyspark.sql import functions as F

    from ..operators.lifecycle import SnapshotTable, _write_chunked
    from .registry import load

    ev = load(spark, sf_dir, "events")
    lo_hi = ev.agg(F.min("user_id"), F.max("user_id")).collect()[0]
    umin, umax = int(lo_hi[0]), int(lo_hi[1])
    span = umax - umin + 1
    ulo, uhi = umin + span // 4, umin + span // 2 - 1

    tbl = SnapshotTable(spark, tempfile.mkdtemp(prefix="pyds_"))
    # map-side user-range bucketing (no NTILE-over-global-Window sort);
    # the oracle filters raw events, so chunk bounds are free to differ
    _write_chunked(
        tbl, ev.withColumn("_c", F.expr(f"((user_id - {umin}) * 4) DIV {span}"))
    )

    register(spark)
    df = (
        spark.read.format(FORMAT_NAME)
        .option("path", tbl.path)
        .load()
        .filter(F.col("user_id").between(ulo, uhi))
    )
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


def pyds_bloom_point_scan(spark, sf_dir: str):
    """Point lookups THROUGH the engine's own source API with Bloom
    pruning at plan time: documents land in a snapshot table chunked by a
    multiplicative doc_id scramble (footer min/max useless — every file
    spans the id domain), ``build_bloom_index`` writes the sidecar, and
    four ``doc_id = k`` reads via ``spark.read.format("snapshot")`` each
    push an EqualTo into ``pushFilters``, where the sidecar excludes
    every file the key provably isn't in (~1 split planned instead of 8;
    the plan-level test pins it). Spark re-applies the filter row-level,
    so pruning stays a pure optimization — the oracle's plain IN-list
    filter catches any unsound exclusion as missing rows.

    Scale: each point lookup plans O(k) sidecar probes + opens O(1)
    files; without the bloom the same read opens every file of an
    unclustered 100 TB table."""
    import tempfile

    from pyspark.sql import functions as F

    from ..operators.lifecycle import SnapshotTable, _write_chunked
    from .registry import load

    docs = load(spark, sf_dir, "documents")
    tbl = SnapshotTable(spark, tempfile.mkdtemp(prefix="pydsbloom_"))
    _write_chunked(
        tbl,
        docs.select("doc_id", "lang", "n_chars").withColumn(
            "_c", (F.col("doc_id") * F.lit(2654435761)) % F.lit(8)
        ),
    )
    tbl.build_bloom_index("doc_id")

    register(spark)
    mx = int(docs.agg(F.max("doc_id")).collect()[0][0])
    out = None
    for p in (0, mx // 3, (2 * mx) // 3, mx):
        part = (
            spark.read.format(FORMAT_NAME)
            .option("path", tbl.path)
            .load()
            .filter(F.col("doc_id") == p)
        )
        out = part if out is None else out.unionByName(part)
    return out.select("doc_id", "lang", "n_chars").orderBy("doc_id")


QUERIES = {
    "pyds_snapshot_scan": pyds_snapshot_scan,
    "pyds_bloom_point_scan": pyds_bloom_point_scan,
}

ORACLE = {
    "pyds_snapshot_scan": """
        WITH bounds AS (
            SELECT MIN(user_id) AS umin,
                   MAX(user_id) - MIN(user_id) + 1 AS span
            FROM events
        )
        SELECT event_type, COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users
        FROM events, bounds
        WHERE user_id BETWEEN umin + span // 4 AND umin + span // 2 - 1
        GROUP BY event_type
    """,
    "pyds_bloom_point_scan": """
        WITH mxx AS (SELECT MAX(doc_id) AS m FROM documents),
        probes AS (
            SELECT CAST(0 AS BIGINT) AS p FROM mxx
            UNION ALL SELECT m // 3 FROM mxx
            UNION ALL SELECT (2 * m) // 3 FROM mxx
            UNION ALL SELECT m FROM mxx
        )
        SELECT d.doc_id, d.lang, d.n_chars
        FROM documents d JOIN probes ON d.doc_id = probes.p
        ORDER BY d.doc_id
    """,
}
