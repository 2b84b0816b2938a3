"""Incremental batch materialization — the reference's SqlBatchView +
batch_update machinery (SURVEY §3.3) rebuilt on plain Spark + parquet.

Semantics preserved from the reference:

- A view is a (count_query, extract_query, merge_query) triple with
  {begin}/{end} placeholders (sql_batch_view.rs:243-293; log_stats_view.rs
  is the canonical instance).
- Data is bucketed by **insert_time**; late events land in new insert
  buckets — freshness is re-checked by comparing the count_query result
  (source hash ≈ sum of source object counts) against the hash recorded for
  the partition; mismatch → recreate (batch_update.rs:23-100, esp. 81-88).
  There is NO watermark-style row dropping (SURVEY §2.9).
- Each partition also records min/max **event time** for query-range
  pruning (migration.rs:117-131): reads prune partitions whose event-time
  range doesn't overlap the query range, then re-apply the row-level filter
  (the 'inexact pushdown' contract, materialized_view.rs:99-107).
- merge_query re-aggregates N small partitions into one; aggregates must be
  composable — sum(count), not count(*) (sql_batch_view.rs:170-175).
- Views carry an update_group so derived views materialize after their
  sources (blocks=1000 → log/measures=2000 → log_stats=3000,
  log_stats_view.rs:75).

Spark-first choices: partitions are parquet directories under
``<warehouse>/<view>/<begin>_<end>_<token>/`` — written ONCE at a unique,
never-reused path, then committed by the per-view manifest commit; the
manifest is the single atomicity point, exactly the reference's shape
(data to object storage at a unique key, visibility via the catalog's
transactional retire+insert — write_partition.rs:626-910 — never via
rename). Readers only open paths the manifest lists, so a half-written
partition is unreachable by construction, on POSIX and object stores
alike; the warehouse root may be a plain path or any URI Spark and
pyarrow.fs both speak (``file://``, ``s3a://``, ``hdfs://`` — fslayer.py).
The catalog is a chain of generation-numbered parquet files per view
(``<view>.g<gen>.parquet``) and a commit is a compare-and-swap: read
generation v, put-if-absent claim of v+1, retry-reapplying the mutation's
DELTA on the winner's state after a lost race (_commit_manifest /
_commit_delta) — the multi-writer arbitration the reference gets from
Postgres transactions, without a database. Reads are
``spark.read.parquet(selected partition dirs)`` so Catalyst still sees
plain parquet with full pushdown.
"""

from __future__ import annotations

import json
import math
import os
import re
import threading
import time
import uuid
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class BatchViewSpec:
    """(count, extract, merge) SQL triple. Queries may reference any table
    registered in the session; {begin}/{end} are epoch-ns integers splicing
    the insert-time bucket bounds."""

    name: str
    count_query: str
    extract_query: str
    merge_query: str  # over a temp view named `source`
    time_column: str  # event-time column of the extract output (ns BIGINT)
    update_group: int = 2000


# The canonical instance: log_stats = 1-minute pre-aggregation of
# log_entries (log_stats_view.rs:18-59). count_query hashes source state by
# insert_time; merge re-aggregates with sum(count).
LOG_STATS = BatchViewSpec(
    name="log_stats",
    count_query="""
        SELECT COALESCE(SUM(nb_objects), 0) AS src
        FROM blocks
        WHERE array_contains(tags, 'log')
          AND insert_time_ns >= {begin} AND insert_time_ns < {end}
    """,
    extract_query="""
        SELECT time_ns - time_ns % 60000000000 AS time_bin_ns,
               process_id, level, target, COUNT(*) AS count
        FROM log_entries
        WHERE insert_time_ns >= {begin} AND insert_time_ns < {end}
        GROUP BY 1, 2, 3, 4
    """,
    merge_query="""
        SELECT time_bin_ns, process_id, level, target, SUM(count) AS count
        FROM source
        GROUP BY time_bin_ns, process_id, level, target
    """,
    time_column="time_bin_ns",
    update_group=3000,
)


# Sketch-typed instance: hourly DISTINCT emitting processes per level.
# Plain counts can't compose across partitions for COUNT DISTINCT; a
# DataSketches HLL column can — extract writes binary sketch partials to
# parquet, merge re-unions them (the same composable-aggregate contract as
# LOG_STATS's sum(count), sql_batch_view.rs:170-175, extended to distinct
# counting). Readers estimate with hll_sketch_estimate(proc_sketch).
PROC_STATS = BatchViewSpec(
    name="proc_stats",
    count_query="""
        SELECT COALESCE(SUM(nb_objects), 0) AS src
        FROM blocks
        WHERE array_contains(tags, 'log')
          AND insert_time_ns >= {begin} AND insert_time_ns < {end}
    """,
    extract_query="""
        SELECT time_ns - time_ns % 3600000000000 AS time_bin_ns,
               level,
               hll_sketch_agg(process_id, 16) AS proc_sketch,
               COUNT(*) AS count
        FROM log_entries
        WHERE insert_time_ns >= {begin} AND insert_time_ns < {end}
        GROUP BY 1, 2
    """,
    # lgK=16 on the partials (not the default 12): hll_union_agg adopts
    # the partials' lgConfigK, so the MATERIALIZED precision is the merged
    # precision — RSE 0.41% at 64 KB worst-case dense sketch size per
    # parquet row (lgK=20's 0.10% costs 1 MB dense/row, the wrong trade
    # for a stats table written once per hour x level at 100 TB)
    # allowDifferentLgConfigK=true: a warehouse materialized before the
    # lgK=16 upgrade holds lgK=12 partials; the union must keep merging
    # them (it downgrades to the smallest lgConfigK among inputs) instead
    # of failing the first post-upgrade merge. New partitions converge to
    # 16 as old ones retire.
    merge_query="""
        SELECT time_bin_ns, level,
               hll_union_agg(proc_sketch, true) AS proc_sketch,
               SUM(count) AS count
        FROM source
        GROUP BY time_bin_ns, level
    """,
    time_column="time_bin_ns",
    update_group=3000,
)


@dataclass
class Partition:
    begin_insert_ns: int
    end_insert_ns: int
    source_hash: int
    min_event_ns: int
    max_event_ns: int
    path: str
    updated_unix: float = field(default_factory=time.time)
    # schema fingerprint of the written rows; "" on pre-upgrade manifests.
    # The reference versions every view schema and hides partitions whose
    # recorded hash mismatches the current one (SCHEMA_VERSION constants,
    # log_view.rs:37; materialized_view.rs:74-83 hash mismatch → rebuild).
    schema_hash: str = ""
    # per-column [min, max] of orderable columns (numeric/string), collected
    # in the same job as the event-time bounds at write time. Delta-style
    # data skipping beyond the reference's time-only pruning
    # (partition_cache.rs prunes on insert/event time alone): at 100 TB a
    # catalog filter on e.g. process_id is the difference between opening
    # every partition file and only those whose range can match. {} on
    # pre-upgrade manifests — missing stats never prune (safe default).
    column_stats: dict = field(default_factory=dict)


def _bounds_and_stats(df: DataFrame, time_column: str):
    """Event-time bounds + per-column [min, max] for orderable primitive
    columns in one aggregation job. Dates/timestamps are excluded (not
    JSON-serializable in the manifest); non-finite float endpoints (NaN —
    Spark's max orders it largest — or ±Inf) drop that column's stats
    entirely, because a NaN bound would make every skipping comparison
    False and silently prune partitions that DO contain matching rows —
    missing stats never prune."""
    stat_cols = [
        f.name
        for f in df.schema.fields
        if f.name != time_column
        and f.dataType.simpleString()
        in ("int", "bigint", "smallint", "tinyint", "float", "double", "string")
    ]
    aggs = [F.min(time_column).alias("mn"), F.max(time_column).alias("mx")]
    for c in stat_cols:
        aggs += [F.min(c).alias(f"_mn_{c}"), F.max(c).alias(f"_mx_{c}")]
    bounds = df.agg(*aggs).collect()[0]

    def usable(v):
        if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
            return False
        # long string endpoints (message/text columns) would bloat the JSON
        # manifest unboundedly — drop that column's stats rather than store
        # multi-KB values per partition. (Delta truncates to a 32-char
        # prefix with an incremented max; dropping is the simpler safe
        # choice — missing stats never prune.)
        if isinstance(v, str) and len(v) > 64:
            return False
        return True

    column_stats = {
        c: [bounds[f"_mn_{c}"], bounds[f"_mx_{c}"]]
        for c in stat_cols
        if bounds[f"_mn_{c}"] is not None
        and usable(bounds[f"_mn_{c}"])
        and usable(bounds[f"_mx_{c}"])
    }
    return bounds, column_stats


def schema_fingerprint(df: DataFrame) -> str:
    """Deterministic fingerprint of a DataFrame's schema (name:type pairs,
    order-sensitive like the reference's Arrow schema hash)."""
    import hashlib

    canon = ";".join(f"{f.name}:{f.dataType.simpleString()}" for f in df.schema.fields)
    return hashlib.md5(canon.encode()).hexdigest()[:16]


class ManifestConflict(RuntimeError):
    """A concurrent writer claimed the next manifest generation every time
    we tried. Raised only after _COMMIT_RETRIES read-reapply-claim rounds
    — each retry re-reads the winner's catalog and re-applies this
    writer's DELTA, so a raise means sustained live contention, never a
    silently lost update."""


# Read-reapply-claim rounds before a commit gives up. Each round re-reads
# the freshest catalog, so contention this deep means tens of writers
# hammering ONE view — far outside the one-writer-per-view-per-tick
# deployment posture this backstops.
_COMMIT_RETRIES = 64

# <view>.g000000000042.parquet (local/HDFS: hard-link-claimed, one file
# per generation) or <view>.g000000000042_5f3a9c1d.parquet (object
# stores: token-unique PUT + winner check).
_MANIFEST_GEN_RE = re.compile(r"\.g(\d{12})(?:_([0-9a-f]{8}))?\.parquet$")

# Prior generations kept after a commit so a reader that listed the
# directory just before the commit can still open its chosen file.
_MANIFEST_KEEP_GENS = 2


# Per-(warehouse, view) write locks — process-wide so every Lakehouse
# instance over the same warehouse shares them. The RLock serializes
# threads; the flock in _view_lock serializes PROCESSES. Keyed depth
# counters make nesting safe (flock on a second fd of the same file
# would self-deadlock; only the outermost level takes the OS lock).
_VIEW_LOCKS: dict = {}
_VIEW_LOCK_DEPTH: dict = {}
_VIEW_LOCKS_GUARD = threading.Lock()


class Lakehouse:
    """Partition catalog + materialization driver for BatchViewSpecs."""

    def __init__(self, spark: SparkSession, warehouse: str):
        from micromegas_spark.fslayer import WarehouseFS

        self.spark = spark
        self.warehouse = warehouse
        self.fs = WarehouseFS(warehouse)
        self.fs.mkdirs(self.fs.url("_partitions"))

    @contextmanager
    def _view_lock(self, view: str):
        """Multi-writer safety for a view's manifest (VERDICT r3 #7: the
        reference's Postgres catalog gets this from transactions,
        partition_cache.rs; a file manifest needs an advisory lock).
        Every read-modify-write of the manifest — materialize, merge,
        retire — runs under this per-view lock: a process-wide RLock for
        threads sharing the interpreter plus an OS flock on
        _partitions/<view>.lock for concurrent processes, so two writers
        ticking the same view serialize and the second observes the
        first's freshness instead of clobbering it. Locks are per-view:
        maintenance across DIFFERENT views still parallelizes, which is
        the fleet-scale fan-out unit anyway (one writer per view per
        tick). Crash-safe: flock dies with the process, no stale locks.

        On a non-local (URI) warehouse there is no flock; the RLock still
        serializes threads, and cross-process safety comes from the CAS
        manifest commit itself (_commit_manifest: claim generation v+1,
        retry-reapply on loss) — a lost race re-applies the writer's
        delta on the winner's catalog, so no committed partition is ever
        silently dropped. The lock is therefore an OPTIMIZATION where it
        exists (serialized writers never burn CAS retries or duplicate
        bucket work), not the correctness mechanism."""
        import fcntl

        key = (self.fs.root_url, view)
        with _VIEW_LOCKS_GUARD:
            rl = _VIEW_LOCKS.setdefault(key, threading.RLock())
        with rl:
            # depth guarded by rl: only the holding thread touches it
            depth = _VIEW_LOCK_DEPTH.get(key, 0)
            fd = None
            lock_path = self.fs.local_path("_partitions", f"{view}.lock")
            if depth == 0 and lock_path is not None:
                fd = os.open(lock_path, os.O_CREAT | os.O_RDWR, 0o644)
                fcntl.flock(fd, fcntl.LOCK_EX)
            _VIEW_LOCK_DEPTH[key] = depth + 1
            try:
                yield
            finally:
                _VIEW_LOCK_DEPTH[key] = depth
                if fd is not None:
                    fcntl.flock(fd, fcntl.LOCK_UN)
                    os.close(fd)

    # -- manifest ----------------------------------------------------------
    #
    # The partition catalog is a parquet TABLE, not a JSON sidecar: one
    # file per view under _partitions/, all sharing one schema (with a
    # `view` column), so the whole catalog is directly queryable —
    # spark.read.parquet(warehouse/_partitions) or partitions_table() —
    # exactly like the reference's Postgres catalog is queryable SQL
    # (partition_cache.rs:329-466). At fleet scale (10⁶ partitions) a
    # columnar manifest loads in milliseconds and predicate-prunes;
    # sub-file row groups keep even a giant view's catalog scannable.
    # Atomicity: one atomic swap of the per-view file (tmp+move on
    # POSIX/HDFS, single PUT on object stores — fslayer.py) — the
    # transactional retire+insert. Legacy JSON manifests are still read
    # (and upgraded on the next save).

    _MANIFEST_FIELDS = [
        "begin_insert_ns",
        "end_insert_ns",
        "source_hash",
        "min_event_ns",
        "max_event_ns",
        "path",
        "updated_unix",
        "schema_hash",
    ]

    def _manifest_path(self, view: str) -> str:
        return self.fs.url("_partitions", f"{view}.parquet")

    def _legacy_manifest_path(self, view: str) -> str:
        return self.fs.url("_partitions", f"{view}.json")

    def _manifest_candidates(self, view: str) -> list[tuple[int, str]]:
        """(generation, filename) of every generation-numbered manifest
        file for ``view`` in _partitions/, unordered."""
        prefix = f"{view}.g"
        out = []
        for name in self.fs.listdir(self.fs.url("_partitions")):
            if not name.startswith(prefix):
                continue
            m = _MANIFEST_GEN_RE.search(name)
            if m and name[: m.start()] == view:
                out.append((int(m.group(1)), name))
        return out

    def _read_manifest_file(self, fname: str) -> list[Partition]:
        tbl = self.fs.read_parquet_table(self.fs.url("_partitions", fname))
        out = []
        for row in tbl.to_pylist():
            row.pop("view", None)
            stats = row.pop("column_stats_json", None)
            row["column_stats"] = json.loads(stats) if stats else {}
            out.append(Partition(**row))
        return out

    def _manifest_state(self, view: str) -> tuple[list[Partition], int]:
        """Current catalog + its generation — the read half of the CAS
        commit (read(v) → claim(v+1), VERDICT r10 #1). Winner among
        generation files: highest generation, then lexicographically
        smallest name (ties only possible on object stores, where names
        carry a random token — see _commit_manifest). Pre-CAS manifests
        (<view>.parquet / <view>.json) read as generation 0, so the first
        CAS commit upgrades them in place. Retries the list+read when a
        concurrent committer's old-generation sweep removes the chosen
        file between our list and open (needs ≥ _MANIFEST_KEEP_GENS
        commits inside that window)."""
        for _ in range(4):
            cands = self._manifest_candidates(view)
            try:
                if cands:
                    gen, fname = min(cands, key=lambda c: (-c[0], c[1]))
                    return self._read_manifest_file(fname), gen
                if self.fs.exists(self._manifest_path(view)):
                    return self._read_manifest_file(f"{view}.parquet"), 0
                legacy = self._legacy_manifest_path(view)
                if self.fs.exists(legacy):
                    return [
                        Partition(**row)
                        for row in json.loads(self.fs.read_bytes(legacy))
                    ], 0
                return [], 0
            except (FileNotFoundError, OSError):
                continue
        raise ManifestConflict(
            f"manifest for {view!r} kept disappearing mid-read "
            "(sustained concurrent commits); retry the operation"
        )

    def list_partitions(self, view: str) -> list[Partition]:
        return self._manifest_state(view)[0]

    def _manifest_table(self, view: str, parts: list[Partition]):
        import pyarrow as pa

        schema = pa.schema(
            [
                ("view", pa.string()),
                ("begin_insert_ns", pa.int64()),
                ("end_insert_ns", pa.int64()),
                ("source_hash", pa.int64()),
                ("min_event_ns", pa.int64()),
                ("max_event_ns", pa.int64()),
                ("path", pa.string()),
                ("updated_unix", pa.float64()),
                ("schema_hash", pa.string()),
                # heterogenous per-column [min,max] (numeric or string)
                # ride as JSON so the table schema stays fixed
                ("column_stats_json", pa.string()),
            ]
        )
        rows = {name: [] for name in schema.names}
        for p in parts:
            rows["view"].append(view)
            for f in self._MANIFEST_FIELDS:
                rows[f].append(getattr(p, f))
            rows["column_stats_json"].append(json.dumps(p.column_stats or {}))
        return pa.Table.from_pydict(rows, schema=schema)

    def _commit_manifest(self, view: str, parts: list[Partition], base_gen: int) -> bool:
        """THE commit point, as a compare-and-swap: claim generation
        ``base_gen + 1`` with a put-if-absent (the reference's equivalent
        arbitration is Postgres's transactional retire+insert,
        write_partition.rs:790+; pre-r11 this was an unconditional swap
        and two flock-less processes could silently lose each other's
        partitions in the whole-manifest read-modify-write).

        Local/HDFS: the claim is a hard-link create (fslayer
        claim_parquet_table) — atomic across processes with NO advisory
        lock, so the no-flock path is a true CAS: exactly one writer per
        generation, the loser re-reads and re-applies its delta.

        Object stores: every writer PUTs at a token-unique key (atomic,
        never overwrites a rival), then lists its generation and
        withdraws unless it holds the lexicographically smallest name.
        Residual window: a slower writer landing the same generation
        with a smaller token AFTER this check — it closes when the
        store's conditional PUT is wired into claim_parquet_table; until
        then the rival's file stays visible, so arbitration remains
        CONSISTENT (every reader and later committer agrees on the same
        winner by name).

        Returns False when the generation was lost; callers loop
        (_commit_delta / _save_manifest)."""
        tbl = self._manifest_table(view, parts)
        new_gen = base_gen + 1
        if self.fs.is_local and self.fs.rename_safe:
            fname = f"{view}.g{new_gen:012d}.parquet"
            if not self.fs.claim_parquet_table(
                tbl, self.fs.url("_partitions", fname)
            ):
                return False
        else:
            # pre-claim check: a generation anyone ALREADY claimed is
            # lost before we PUT — this catches every non-simultaneous
            # race (including the sequential slow-writer case) without
            # conditional-PUT support
            if any(g == new_gen for g, _ in self._manifest_candidates(view)):
                return False
            fname = f"{view}.g{new_gen:012d}_{uuid.uuid4().hex[:8]}.parquet"
            url = self.fs.url("_partitions", fname)
            if not self.fs.claim_parquet_table(tbl, url):
                return False
            rivals = [n for g, n in self._manifest_candidates(view) if g == new_gen]
            if rivals and min(rivals) != fname:
                self.fs.delete_file(url)  # lost the generation: withdraw
                return False
        self._sweep_manifest_gens(view, new_gen)
        return True

    def _sweep_manifest_gens(self, view: str, new_gen: int) -> None:
        """Post-commit hygiene: drop generations old enough that no
        in-flight reader can still want them (losers at those generations
        included), plus the pre-CAS legacy files — the generation chain
        now wins. Best-effort: a sweep that loses a race to another
        sweep just finds the file already gone."""
        for g, name in self._manifest_candidates(view):
            if g <= new_gen - 1 - _MANIFEST_KEEP_GENS:
                self.fs.delete_file(self.fs.url("_partitions", name))
        for legacy in (self._manifest_path(view), self._legacy_manifest_path(view)):
            if self.fs.exists(legacy):
                self.fs.delete_file(legacy)

    def _save_manifest(self, view: str, parts: list[Partition]) -> None:
        """Unconditional catalog save: CAS-retried until this exact
        ``parts`` list is the committed state (tests and the legacy
        upgrade path use it). Catalog MUTATORS never call this — they go
        through _commit_delta so a lost race re-applies their DELTA on
        the winner's state instead of overwriting it."""
        for _ in range(_COMMIT_RETRIES):
            _, gen = self._manifest_state(view)
            if self._commit_manifest(view, parts, gen):
                return
        raise ManifestConflict(f"could not commit manifest for {view!r}")

    def _commit_delta(self, view: str, drop=None, add=()) -> list[Partition]:
        """Read-apply-claim loop — every catalog mutation is a DELTA
        (a drop predicate re-evaluated on the freshest state, plus
        partitions to append), so losing a generation race to a writer
        of a DIFFERENT bucket means re-applying the delta on top of the
        winner's catalog, never overwriting it. (The round-10 lost-
        partition scenario on no-flock warehouses: A reads [], B reads
        [], A commits [p1], B commits [p2] over base [] → p1 silently
        orphaned. Here B's claim of A's generation fails, B re-reads
        [p1], commits [p1, p2].) Returns the partitions the predicate
        removed from the COMMITTED state, for post-commit file
        retirement — files are only ever deleted once unreachable."""
        for _ in range(_COMMIT_RETRIES):
            parts, gen = self._manifest_state(view)
            dropped = [p for p in parts if drop(p)] if drop else []
            new = [p for p in parts if p not in dropped] + list(add)
            if self._commit_manifest(view, new, gen):
                return dropped
        raise ManifestConflict(f"could not commit delta for {view!r}")

    _MANIFEST_DDL = (
        "view STRING, begin_insert_ns BIGINT, end_insert_ns BIGINT, "
        "source_hash BIGINT, min_event_ns BIGINT, max_event_ns BIGINT, "
        "path STRING, updated_unix DOUBLE, schema_hash STRING, "
        "column_stats_json STRING"
    )

    def _winner_manifest_files(self) -> dict[str, str]:
        """view → its winning manifest FILE name: the generation chain's
        head if one exists, else the pre-CAS single parquet. One listdir
        serves every view."""
        best: dict[str, tuple] = {}
        for name in self.fs.listdir(self.fs.url("_partitions")):
            m = _MANIFEST_GEN_RE.search(name)
            if m:
                view, key = name[: m.start()], (-int(m.group(1)), name)
            elif (
                name.endswith(".parquet")
                and ".tmp" not in name
                and ".claim" not in name
            ):
                view, key = name[: -len(".parquet")], (0, name)
            else:
                continue
            if view not in best or key < best[view][0]:
                best[view] = (key, name)
        return {v: n for v, (_k, n) in best.items()}

    def partitions_table(self):
        """The entire partition catalog as a DataFrame (every view's
        winning manifest file is one parquet table under _partitions/) —
        the queryable-catalog property of the reference's Postgres-backed
        list_partitions, without a serving database. Views still on the
        legacy JSON manifest (not yet upgraded by a save) are included
        via driver-side rows, so a pre-upgrade warehouse reports its
        full catalog."""
        winners = self._winner_manifest_files()
        files = [self.fs.url("_partitions", n) for n in winners.values()]
        pq_views = set(winners)
        legacy_rows = [
            (
                v,
                int(p.begin_insert_ns),
                int(p.end_insert_ns),
                int(p.source_hash),
                int(p.min_event_ns),
                int(p.max_event_ns),
                p.path,
                float(p.updated_unix),
                p.schema_hash,
                json.dumps(p.column_stats or {}),
            )
            for v in self.list_view_sets()
            if v not in pq_views
            for p in self.list_partitions(v)
        ]
        out = None
        if files:
            # column order differs between writes only by schema, fixed here
            out = self.spark.read.parquet(*files).select(
                *[c.split()[0] for c in self._MANIFEST_DDL.split(", ")]
            )
        if legacy_rows:
            legacy_df = self.spark.createDataFrame(legacy_rows, self._MANIFEST_DDL)
            out = legacy_df if out is None else out.unionByName(legacy_df)
        if out is None:
            return self.spark.createDataFrame([], self._MANIFEST_DDL)
        return out

    # -- materialization ---------------------------------------------------

    def _source_hash(self, spec: BatchViewSpec, begin_ns: int, end_ns: int) -> int:
        row = self.spark.sql(
            spec.count_query.format(begin=begin_ns, end=end_ns)
        ).collect()[0]
        return int(row[0] or 0)

    def materialize_bucket(self, spec: BatchViewSpec, begin_ns: int, end_ns: int) -> str:
        """Create/refresh one insert-time bucket. Returns 'up_to_date' |
        'covered' | 'created' | 'empty' (the verify_overlapping_partitions
        decision, batch_update.rs:12-100): an exact-bounds fresh partition
        aborts; a fresh *covering* partition (e.g. the output of
        merge_partitions) also aborts — re-creating the fine buckets under
        it would double the data; a stale covering/misaligned overlap is
        retired and recreated at this bucket granularity."""
        with self._view_lock(spec.name):
            return self._materialize_bucket(spec, begin_ns, end_ns)

    def _materialize_bucket(self, spec: BatchViewSpec, begin_ns: int, end_ns: int) -> str:
        current = self._source_hash(spec, begin_ns, end_ns)
        parts = self.list_partitions(spec.name)
        existing = [
            p for p in parts if p.begin_insert_ns == begin_ns and p.end_insert_ns == end_ns
        ]
        if existing and existing[0].source_hash == current:
            return "up_to_date"
        overlapping = [
            p
            for p in parts
            if p.begin_insert_ns < end_ns
            and p.end_insert_ns > begin_ns
            and not (p.begin_insert_ns == begin_ns and p.end_insert_ns == end_ns)
        ]
        if overlapping:
            covering = [
                p
                for p in overlapping
                if p.begin_insert_ns <= begin_ns and p.end_insert_ns >= end_ns
            ]
            if covering:
                cov = covering[0]
                cov_hash = self._source_hash(spec, cov.begin_insert_ns, cov.end_insert_ns)
                if cov.source_hash == cov_hash:
                    return "covered"
            # stale covering partition or misaligned partial overlaps:
            # retire them (manifest commit FIRST — files only after they
            # are unreachable), then recreate this bucket from source
            dropped = self._commit_delta(
                spec.name,
                drop=lambda p: (
                    p.begin_insert_ns < end_ns
                    and p.end_insert_ns > begin_ns
                    and not (
                        p.begin_insert_ns == begin_ns and p.end_insert_ns == end_ns
                    )
                ),
            )
            for p in dropped:
                self.fs.rmtree(p.path)
            parts = self.list_partitions(spec.name)
            existing = [
                p for p in parts if p.begin_insert_ns == begin_ns and p.end_insert_ns == end_ns
            ]
        if current == 0 and not existing:
            return "empty"

        df = self.spark.sql(spec.extract_query.format(begin=begin_ns, end=end_ns))
        # event-time bounds + per-column min/max stats in ONE aggregation
        # job (stats are free at write time; they buy catalog-level data
        # skipping at read time)
        bounds, column_stats = _bounds_and_stats(df, spec.time_column)
        # write-once to a unique, never-reused path; the manifest swap
        # below is the commit (write_partition.rs: unique object key +
        # catalog insert — no rename on any filesystem)
        out_dir = self.fs.unique_dir_url(spec.name, f"{begin_ns}_{end_ns}")
        df.write.mode("overwrite").parquet(out_dir)

        new_part = Partition(
            begin_insert_ns=begin_ns,
            end_insert_ns=end_ns,
            source_hash=current,
            min_event_ns=int(bounds.mn) if bounds.mn is not None else begin_ns,
            max_event_ns=int(bounds.mx) if bounds.mx is not None else end_ns,
            path=out_dir,
            schema_hash=schema_fingerprint(df),
            column_stats=column_stats,
        )
        # retire+insert as one delta: whoever committed this exact bucket
        # meanwhile (flock-less same-bucket race) is replaced — one
        # winner per bucket, the rival's dir becomes a vacuumable orphan
        dropped = self._commit_delta(
            spec.name,
            drop=lambda p: (
                p.begin_insert_ns == begin_ns and p.end_insert_ns == end_ns
            ),
            add=[new_part],
        )
        for old in dropped:  # retire files only once unreachable
            if old.path != out_dir:
                self.fs.rmtree(old.path)
        return "created"

    def materialize_range(
        self, spec: BatchViewSpec, begin_ns: int, end_ns: int, bucket_ns: int,
        log=None,
    ) -> dict[str, int]:
        """Tick over aligned insert-time buckets (maintenance.rs:140-212
        cadence loop): skip fresh, rebuild stale.

        ``log``: optional TaskLog — one progress row per bucket decision
        plus a summary, mirroring the per-partition messages the
        reference's logger emits from batch_update.rs:40-100 (S11 task-log
        surface; see materialize/tasklog.py)."""
        stats: dict[str, int] = {}
        b = begin_ns - begin_ns % bucket_ns
        while b < end_ns:
            status = self.materialize_bucket(spec, b, b + bucket_ns)
            stats[status] = stats.get(status, 0) + 1
            if log is not None:
                log.write(f"{spec.name}[{b}, {b + bucket_ns}): {status}")
            b += bucket_ns
        if log is not None:
            log.write(
                f"{spec.name}: done, "
                + ", ".join(f"{k}={v}" for k, v in sorted(stats.items()))
            )
        return stats

    def merge_partitions(self, spec: BatchViewSpec, begin_ns: int, end_ns: int) -> str:
        """MergeExisting (batch_update.rs): re-aggregate the N up-to-date
        partitions inside [begin, end) into one via merge_query."""
        with self._view_lock(spec.name):
            return self._merge_partitions(spec, begin_ns, end_ns)

    def _merge_partitions(self, spec: BatchViewSpec, begin_ns: int, end_ns: int) -> str:
        parts = self.list_partitions(spec.name)
        inside = [
            p for p in parts if p.begin_insert_ns >= begin_ns and p.end_insert_ns <= end_ns
        ]
        if len(inside) <= 1:
            return "abort"
        src = self.spark.read.parquet(*[p.path for p in inside])
        src.createOrReplaceTempView("source")
        merged = self.spark.sql(spec.merge_query)
        # unique write-once path; the manifest swap below is the commit
        out_dir = self.fs.unique_dir_url(spec.name, f"{begin_ns}_{end_ns}")
        # recompute column stats from the MERGED rows — child stats can't
        # be unioned because merge_query re-aggregates (a SUM(count) can
        # exceed any child's max); merged partitions are the biggest, so
        # skipping matters most exactly here. Persisted across the two
        # actions (stats job + write) so the merge aggregation runs once.
        merged = merged.persist()
        try:
            _, column_stats = _bounds_and_stats(merged, spec.time_column)
            merged.write.mode("overwrite").parquet(out_dir)
        finally:
            merged.unpersist()
        merged_part = Partition(
            begin_insert_ns=begin_ns,
            end_insert_ns=end_ns,
            source_hash=sum(p.source_hash for p in inside),
            min_event_ns=min(p.min_event_ns for p in inside),
            max_event_ns=max(p.max_event_ns for p in inside),
            path=out_dir,
            schema_hash=schema_fingerprint(merged),
            column_stats=column_stats,
        )
        # drop EXACTLY the children the merge read (frozen identity set,
        # not a range predicate): on a CAS retry, a partition a rival
        # committed inside the range meanwhile is NOT covered by the
        # merged output and must survive — the next tick's covering/
        # overlap arbitration resolves it
        inside_keys = {
            (p.begin_insert_ns, p.end_insert_ns, p.path) for p in inside
        }
        dropped = self._commit_delta(
            spec.name,
            drop=lambda p: (p.begin_insert_ns, p.end_insert_ns, p.path)
            in inside_keys,
            add=[merged_part],
        )
        for p in dropped:  # retire after the manifest commit
            if p.path != out_dir:
                self.fs.rmtree(p.path)
        return "merged"

    def materialize_all(
        self, specs: list[BatchViewSpec], begin_ns: int, end_ns: int, bucket_ns: int
    ) -> dict[str, dict[str, int]]:
        """One maintenance tick over many views, ordered by update_group so
        derived views read fresh upstreams (maintenance.rs:309-346;
        blocks=1000 → log/measures=2000 → log_stats=3000, SURVEY §2.9)."""
        out: dict[str, dict[str, int]] = {}
        for spec in sorted(specs, key=lambda s: s.update_group):
            out[spec.name] = self.materialize_range(spec, begin_ns, end_ns, bucket_ns)
        return out

    # -- admin ops (SURVEY §2.10: list_partitions / retire_partitions /
    # materialize_partitions / regenerate_partitions; gated admin UDFs in
    # the reference, query.rs:150-175 — here plain Python API) -------------

    def partitions_df(self, view: str | None = None) -> DataFrame:
        """list_partitions as a DataFrame/SQL surface (the reference's
        list_partitions UDTF, query.rs:104-176): one row per live
        partition with insert/event-time bounds, source hash and path."""
        views = [view] if view else self.list_view_sets()
        rows = [
            (
                v,
                p.begin_insert_ns,
                p.end_insert_ns,
                p.min_event_ns,
                p.max_event_ns,
                p.source_hash,
                p.path,
                float(p.updated_unix),
                p.schema_hash,
            )
            for v in views
            for p in self.list_partitions(v)
        ]
        return self.spark.createDataFrame(
            rows,
            "view_set STRING, begin_insert_ns BIGINT, end_insert_ns BIGINT, "
            "min_event_ns BIGINT, max_event_ns BIGINT, source_hash BIGINT, "
            "path STRING, updated_unix DOUBLE, schema_hash STRING",
        )

    def current_schema_hash(self, spec: BatchViewSpec) -> str:
        """Fingerprint of the schema the spec currently extracts — the
        analogue of the ViewFactory's current SCHEMA_VERSION. Lazy: builds
        the plan over an empty range, never executes it."""
        return schema_fingerprint(
            self.spark.sql(spec.extract_query.format(begin=0, end=0))
        )

    def list_incompatible_partitions(
        self, specs: list[BatchViewSpec], view: str | None = None
    ) -> DataFrame:
        """Partitions whose recorded schema hash differs from the view's
        current one (python/micromegas/micromegas/admin.py:14-86:
        list_partitions ⨝ list_view_sets on hash mismatch). These are
        invisible to ``read(..., schema_hash=...)`` but hold storage until
        retired — the schema-evolution cleanup surface."""
        current = {s.name: self.current_schema_hash(s) for s in specs}
        pdf = self.partitions_df(view)
        cur_df = self.spark.createDataFrame(
            list(current.items()), "view_set STRING, current_schema_hash STRING"
        )
        return (
            pdf.join(F.broadcast(cur_df), "view_set")
            .where(F.col("schema_hash") != F.col("current_schema_hash"))
            .select(
                "view_set",
                "begin_insert_ns",
                "end_insert_ns",
                F.col("schema_hash").alias("incompatible_schema_hash"),
                "current_schema_hash",
                "path",
            )
            .orderBy("view_set", "begin_insert_ns")
        )

    def retire_incompatible_partitions(
        self, specs: list[BatchViewSpec], view: str | None = None
    ) -> dict[str, int]:
        """Retire exactly the hash-mismatched partitions
        (admin.py:87-200: metadata-targeted retirement so compatible
        partitions are untouched). Returns per-view retired counts."""
        rows = self.list_incompatible_partitions(specs, view).collect()
        out: dict[str, int] = {}
        for v in {r["view_set"] for r in rows}:
            bad = {(r["begin_insert_ns"], r["end_insert_ns"]) for r in rows if r["view_set"] == v}
            with self._view_lock(v):
                drop = self._commit_delta(
                    v,
                    drop=lambda p: (p.begin_insert_ns, p.end_insert_ns) in bad,
                )
                for p in drop:
                    self.fs.rmtree(p.path)
            out[v] = len(drop)
        return out

    def list_view_sets(self) -> list[str]:
        names = set()
        for f in self.fs.listdir(self.fs.url("_partitions")):
            m = _MANIFEST_GEN_RE.search(f)
            if m:
                names.add(f[: m.start()])
            elif f.endswith(".parquet") and ".tmp" not in f and ".claim" not in f:
                names.add(f[: -len(".parquet")])
            elif f.endswith(".json"):
                names.add(f[: -len(".json")])
        return sorted(names)

    def retire_partitions(
        self, view: str, begin_ns: int, end_ns: int, log=None
    ) -> int:
        """retire_partition_by_metadata (F20): drop partitions whose insert
        bucket lies inside [begin, end) — manifest swap first, then file
        cleanup (same ordering as write_partition.rs retire+insert).

        ``log``: optional TaskLog — one row per retired partition plus a
        summary (S11; the reference's retire_partitions_table_function
        streams the same progress)."""
        with self._view_lock(view):
            return self._retire_partitions(view, begin_ns, end_ns, log)

    def _retire_partitions(
        self, view: str, begin_ns: int, end_ns: int, log=None
    ) -> int:
        drop = self._commit_delta(
            view,
            drop=lambda p: p.begin_insert_ns >= begin_ns
            and p.end_insert_ns <= end_ns,
        )
        for p in drop:
            self.fs.rmtree(p.path)
            if log is not None:
                log.write(
                    f"retired partition {view}[{p.begin_insert_ns}, "
                    f"{p.end_insert_ns}) at {p.path}"
                )
        if log is not None:
            log.write(f"{view}: retired {len(drop)} partition(s)")
        return len(drop)

    def retire_partition_by_metadata(
        self, view_set_name: str, view_instance_id: str, begin_ns: int, end_ns: int
    ) -> int:
        """retire_partition_by_metadata(view_set, instance, begin, end)
        (functions-reference.md:73 — the variant the reference steers
        admins toward, addressing ONE partition by its exact identifiers
        instead of a path): retires the single partition whose insert
        bucket is exactly [begin, end). Lakehouse batch views are
        single-instance, spelled 'global' like the reference's
        process-independent views — a non-matching instance retires
        nothing (per-process JIT instances live in Engine's JIT
        manifests, not this catalog). Returns partitions retired (0/1)."""
        if view_instance_id not in ("global", view_set_name):
            return 0
        with self._view_lock(view_set_name):
            drop = self._commit_delta(
                view_set_name,
                drop=lambda p: p.begin_insert_ns == begin_ns
                and p.end_insert_ns == end_ns,
            )
            for p in drop:
                self.fs.rmtree(p.path)
            return len(drop)

    def retire_partition_by_file(self, path: str) -> int:
        """retire_partition_by_file(file_path) (functions-reference.md:79;
        the reference keeps it for compatibility and steers users to the
        metadata variant): retire the single partition whose storage path
        matches, across all view sets. Returns partitions retired (0/1)."""
        # canon, not norm_url: the caller's spelling and the manifest's
        # may differ in scheme/absoluteness for the same dir (ADVICE r10)
        norm = self.fs.canon(path)
        for view in self.list_view_sets():
            with self._view_lock(view):
                drop = self._commit_delta(
                    view, drop=lambda p: self.fs.canon(p.path) == norm
                )
                if drop:
                    for p in drop:  # the manifest's own spelling, not the caller's
                        self.fs.rmtree(p.path)
                    return len(drop)
        return 0

    def maintenance_tick(
        self,
        spec: BatchViewSpec,
        now_ns: int,
        fine_ns: int = 60 * 10**9,
        coarse_ns: int = 3600 * 10**9,
        recent_window_ns: int | None = None,
        retention_ns: int | None = None,
        vacuum_grace_seconds: float | None = 3600.0,
    ) -> dict:
        """One tick of the maintenance daemon's multi-granularity policy
        (reference maintenance.md:74-98: 'recent data lands in
        fine-grained partitions quickly while older data is consolidated
        into coarser ones', plus hourly retention):

        1. materialize ``fine_ns`` buckets over the trailing
           ``recent_window_ns`` (default: one coarse bucket) ending at
           the last complete fine bucket;
        2. consolidate every COMPLETE coarse bucket older than the
           recent window that still holds >1 partitions into one via
           merge_query (MergeExisting);
        3. if ``retention_ns`` is set, retire partitions past the
           horizon (the --retention-days cleanup);
        4. vacuum orphaned data dirs older than ``vacuum_grace_seconds``
           (crash debris between a data write and its manifest commit,
           and CAS losers' dirs) — the reference's retention daemon
           sweeps on the same tick (maintenance.rs:349-399,
           delete.rs:13-60). ``None`` disables the sweep.

        Returns per-phase stats. Repeated ticks are idempotent on
        unchanged data: fine buckets skip on source-hash freshness,
        consolidated buckets abort on the fresh covering partition, and
        retention only ever moves forward. At fleet scale each phase is
        an independent job the scheduler can fan out per view (the
        update-group ordering of materialize_all still applies across
        dependent views)."""
        stats: dict = {}
        hi = now_ns - now_ns % fine_ns
        window = recent_window_ns if recent_window_ns is not None else coarse_ns
        lo = max(hi - window, 0)
        lo = lo - lo % fine_ns
        stats["fine"] = self.materialize_range(spec, lo, hi, fine_ns)
        # consolidation: coarse buckets wholly before the recent window
        merged = 0
        parts = self.list_partitions(spec.name)
        buckets = sorted(
            {
                p.begin_insert_ns - p.begin_insert_ns % coarse_ns
                for p in parts
                if p.end_insert_ns <= lo
            }
        )
        for cb in buckets:
            if cb + coarse_ns > lo:
                continue  # bucket not wholly outside the recent window
            inside = [
                p
                for p in parts
                if p.begin_insert_ns >= cb and p.end_insert_ns <= cb + coarse_ns
            ]
            if len(inside) > 1:
                if self.merge_partitions(spec, cb, cb + coarse_ns) == "merged":
                    merged += 1
        stats["merged_buckets"] = merged
        if retention_ns is not None:
            stats["retired"] = self.retire_older_than(
                spec.name, now_ns - retention_ns
            )
        if vacuum_grace_seconds is not None:
            stats["vacuumed_orphans"] = self.vacuum_orphans(
                spec.name, vacuum_grace_seconds
            )
        return stats

    def vacuum_orphans(self, view: str, min_age_seconds: float = 3600.0) -> int:
        """Remove data directories no manifest entry references — the
        write-once/commit-by-manifest design makes a crash between the
        parquet write and the manifest swap leave an orphan dir that is
        INVISIBLE to readers (by construction) but holds storage until
        vacuumed, exactly Delta's VACUUM situation (the reference's
        Postgres catalog has the same orphan window between the object
        PUT and the row insert; its retention daemon sweeps). Runs under
        the view lock so it cannot race a writer in the lock domain;
        ``min_age_seconds`` additionally protects an in-flight write from
        a vacuum running outside it (object-store deployments without
        flock). Returns directories removed."""
        import time as _time

        with self._view_lock(view):
            # canon (not norm_url): legacy manifests spell paths
            # differently (relative, plain-absolute) than the candidate
            # URLs built from the root — a spelling mismatch here would
            # delete COMMITTED data (ADVICE r10)
            live = {self.fs.canon(p.path) for p in self.list_partitions(view)}
            view_root = self.fs.url(view)
            if not self.fs.exists(view_root):
                return 0
            removed = 0
            now = _time.time()
            for name in self.fs.listdir(view_root):
                url = f"{view_root}/{name}"
                if self.fs.canon(url) in live:
                    continue
                # newest mtime of the dir AND its contents; unknown age
                # (object-store dir markers carry none) counts as a
                # possible in-flight write, never as infinitely old
                mtime = self.fs.newest_mtime(url)
                if mtime is None or now - mtime < min_age_seconds:
                    continue  # possibly a write in flight outside the lock
                self.fs.rmtree(url)
                removed += 1
            return removed

    def retire_older_than(self, view: str, cutoff_insert_ns: int) -> int:
        """Retention: drop partitions whose insert bucket ended before the
        cutoff (rust/analytics/src/delete.rs:13-60 'delete blocks/partitions
        older than N days')."""
        with self._view_lock(view):
            return self._retire_older_than(view, cutoff_insert_ns)

    def _retire_older_than(self, view: str, cutoff_insert_ns: int) -> int:
        drop = self._commit_delta(
            view, drop=lambda p: p.end_insert_ns <= cutoff_insert_ns
        )
        for p in drop:
            self.fs.rmtree(p.path)
        return len(drop)

    def regenerate_partitions(
        self, spec: BatchViewSpec, begin_ns: int, end_ns: int, bucket_ns: int,
        log=None,
    ) -> dict[str, int]:
        """Force-rebuild aligned buckets bypassing the freshness check
        (batch_update.rs:278-356). ``log``: optional TaskLog (S11) —
        carries both the retire and rebuild phases' progress."""
        self.retire_partitions(
            spec.name, begin_ns - begin_ns % bucket_ns, end_ns, log
        )
        return self.materialize_range(spec, begin_ns, end_ns, bucket_ns, log)

    # -- reads ---------------------------------------------------------------

    def _pruned_partitions(
        self, view: str, schema_hash: str | None,
        begin_event_ns: int | None, end_event_ns: int | None,
    ) -> list[Partition]:
        """Catalog pruning WITHOUT materializing the full catalog: the
        schema-hash and event-time filters run vectorized on the
        manifest's Arrow table, and only SURVIVING rows become Partition
        objects. At 10⁶ catalog entries list_partitions costs ~19 s of
        pure Python object construction (SCALE.md round-11 manifest
        table) while a bounded query's survivors are typically a few
        hundred rows — this keeps query planning over a giant view's
        catalog in milliseconds. Semantics identical to filtering
        list_partitions in Python (equivalence is test-pinned); legacy
        JSON manifests take the Python path."""
        for _ in range(4):
            cands = self._manifest_candidates(view)
            if cands:
                _, fname = min(cands, key=lambda c: (-c[0], c[1]))
            elif self.fs.exists(self._manifest_path(view)):
                fname = f"{view}.parquet"
            else:
                parts = self.list_partitions(view)  # legacy JSON or empty
                if schema_hash is not None:
                    parts = [p for p in parts if p.schema_hash == schema_hash]
                if begin_event_ns is not None:
                    parts = [p for p in parts if p.max_event_ns >= begin_event_ns]
                if end_event_ns is not None:
                    parts = [p for p in parts if p.min_event_ns < end_event_ns]
                return parts
            try:
                tbl = self.fs.read_parquet_table(
                    self.fs.url("_partitions", fname)
                )
            except (FileNotFoundError, OSError):
                continue  # lost a race with a committer's sweep: re-list
            import pyarrow.compute as pc

            mask = None

            def conj(m, new):
                return new if m is None else pc.and_(m, new)

            if schema_hash is not None:
                mask = conj(mask, pc.equal(tbl["schema_hash"], schema_hash))
            if begin_event_ns is not None:
                mask = conj(
                    mask, pc.greater_equal(tbl["max_event_ns"], begin_event_ns)
                )
            if end_event_ns is not None:
                mask = conj(mask, pc.less(tbl["min_event_ns"], end_event_ns))
            if mask is not None:
                tbl = tbl.filter(mask)
            out = []
            for row in tbl.to_pylist():
                row.pop("view", None)
                stats = row.pop("column_stats_json", None)
                row["column_stats"] = json.loads(stats) if stats else {}
                out.append(Partition(**row))
            return out
        raise ManifestConflict(
            f"manifest for {view!r} kept disappearing mid-read "
            "(sustained concurrent commits); retry the operation"
        )

    def read(
        self, view: str, begin_event_ns: int | None = None, end_event_ns: int | None = None,
        time_column: str | None = None, schema_hash: str | None = None,
        column_predicates: dict | None = None,
    ) -> DataFrame:
        """Partition-pruned read: catalog-level event-time overlap test
        (partition_cache.rs:329-466) — vectorized on the manifest's Arrow
        table, _pruned_partitions — then the row-level filter re-applied
        above the scan (inexact pushdown, materialized_view.rs:99-107).
        ``schema_hash`` filters to schema-compatible partitions only
        (partition fetch is schema-hash-keyed, materialized_view.rs:74-96:
        stale-schema partitions are invisible, not errors).

        ``column_predicates``: {col: (op, value)} with op in
        {'=', '>', '>=', '<', '<='} — Delta-style data skipping against
        the manifest's per-partition column_stats [min, max]; partitions
        whose range cannot satisfy the predicate are never opened, and
        the predicate is re-applied as a row filter above the scan (same
        inexact contract as the time filter). Partitions without recorded
        stats for the column are kept (safe default)."""
        parts = self._pruned_partitions(
            view, schema_hash, begin_event_ns, end_event_ns
        )
        for col, (op, val) in (column_predicates or {}).items():
            def can_match(p, col=col, op=op, val=val):
                st = (p.column_stats or {}).get(col)
                if st is None:
                    return True
                mn, mx = st
                # non-finite endpoints (NaN/Inf from a pre-guard manifest)
                # behave like missing stats: never prune
                if any(
                    isinstance(v, float) and (math.isnan(v) or math.isinf(v))
                    for v in (mn, mx)
                ):
                    return True
                # dispatch on op BEFORE comparing, and treat un-comparable
                # stats (e.g. int predicate on a string column) like
                # missing stats: never prune on bad metadata
                try:
                    if op == "=":
                        return mn <= val <= mx
                    if op == ">":
                        return mx > val
                    if op == ">=":
                        return mx >= val
                    if op == "<":
                        return mn < val
                    return mn <= val  # "<="
                except TypeError:
                    return True
            parts = [p for p in parts if can_match(p)]
        if not parts:
            return self.spark.range(0).select()  # empty, schema-less guard
        df = self.spark.read.parquet(*[p.path for p in parts])
        if time_column:
            if begin_event_ns is not None:
                df = df.where(F.col(time_column) >= begin_event_ns)
            if end_event_ns is not None:
                df = df.where(F.col(time_column) < end_event_ns)
        _OPS = {
            "=": lambda c, v: c == v,
            ">": lambda c, v: c > v,
            ">=": lambda c, v: c >= v,
            "<": lambda c, v: c < v,
            "<=": lambda c, v: c <= v,
        }
        for col, (op, val) in (column_predicates or {}).items():
            df = df.where(_OPS[op](F.col(col), F.lit(val)))
        return df
