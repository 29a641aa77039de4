"""Cumulative keyed state, maintained by distributed additive merge.

Replaces the reference's PostgreSQL state path - per-batch temp-table JDBC
writes plus driver-serialized ``INSERT ... ON CONFLICT (key) DO UPDATE SET
counter = counter + EXCLUDED.counter`` (reference ``Mechanism Y.py:136-206``,
``sql/postgres_tables.sql:3-25``) - with a Spark-native design:

  * the additive merge runs as a distributed union + hash re-aggregation
    (exactly what a Delta/Iceberg ``MERGE`` plans), not a driver-side SQL
    statement;
  * state is **hash-bucketed by key** with an independent version per
    bucket: a merge reads and rewrites ONLY the buckets containing keys
    touched by the batch. Per-batch I/O is O(|touched state|), not
    O(|state|) - the same file-pruning a Delta ``MERGE`` gets from data
    skipping, and what makes the store survive 100 TB state with
    localized batches;
  * bucket versions are immutable parquet snapshots with an atomically
    swapped pointer file - readers never see a partial write;
  * merges are **idempotent by batch_id**: replaying a micro-batch after a
    crash-before-checkpoint does not double-count (fixes the reference's
    replay hazard, survey §7.4.2).

On a real lakehouse this class is swapped for Delta ``MERGE INTO`` with the
same interface; the pointer dance is what Delta's transaction log does for
us there. State size scales with distinct keys, not rows, and the merge
shuffles only O(|batch keys| + |touched-bucket state keys|) pre-aggregated
rows. Old bucket versions accumulate like a transaction log until
``vacuum()`` removes the unreferenced snapshots (the Delta ``VACUUM``
analog).
"""

from __future__ import annotations

import contextlib
import json
import os
import tempfile
import threading
from dataclasses import dataclass
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from pyspark_data_engineering_assignment_spark import schemas as S

def _checked_counter_total(c: str, dtype) -> "F.Column":
    """The additive merge's SUM, narrowed back to the state schema's
    counter type. DECIMAL counters (money) get an ANSI-independent
    overflow check (round-13 decimal-overflow axis): a cumulative total
    the column cannot hold refuses the merge loudly - with ANSI off the
    plain cast silently NULLed the key's money, the exact corruption
    the reference's Postgres NUMERIC(18,2) refuses with 'numeric field
    overflow' (``sql/postgres_tables.sql:14``). Integral counters keep
    the plain cast: reaching LONG overflow (9.2e18 transactions) is not
    a reachable state before the decimal money column overflows."""
    from pyspark.sql.types import DecimalType

    from pyspark_data_engineering_assignment_spark.functions.guards import (
        checked_money_total,
    )

    s = F.sum(F.coalesce(F.col(c), F.lit(0)))
    if isinstance(dtype, DecimalType):
        return checked_money_total(
            s, f"state.{c}", dtype.precision, dtype.scale
        ).alias(c)
    return s.cast(dtype).alias(c)


# Fixed grace vacuum gives a _temporary-bearing (possibly in-flight)
# version dir when retention_seconds=0, where the retention cutoff
# equals now() and would spare nothing: long enough to outlive any
# real commit's mkdirs->first-file window, short enough that a crashed
# writer's orphan reclaims on the next periodic vacuum pass.
_IN_FLIGHT_GRACE_S = 60.0


@dataclass(frozen=True)
class StateTableSpec:
    """One cumulative state table: keys + additively merged counters."""

    name: str
    key_cols: tuple[str, ...]
    sum_cols: tuple[str, ...]
    schema: StructType


# The three reference state tables (``sql/postgres_tables.sql:3-25``).
MERCHANT_SUMMARY = StateTableSpec(
    "merchant_transaction_summary",
    ("merchant_id",),
    ("total_transactions",),
    S.MERCHANT_STATE_SCHEMA,
)
CUSTOMER_MERCHANT_SUMMARY = StateTableSpec(
    "customer_merchant_summary",
    ("customer_id", "merchant_id"),
    ("transaction_count", "total_amount_sum"),
    S.CUSTOMER_MERCHANT_STATE_SCHEMA,
)
MERCHANT_GENDER_SUMMARY = StateTableSpec(
    "merchant_gender_summary",
    ("merchant_id",),
    ("male_transaction_count", "female_transaction_count"),
    S.MERCHANT_GENDER_STATE_SCHEMA,
)
REFERENCE_TABLES = (MERCHANT_SUMMARY, CUSTOMER_MERCHANT_SUMMARY, MERCHANT_GENDER_SUMMARY)


class StateStore(Protocol):
    """What ``DetectionPipeline`` requires of a state backend. The full
    surface is declared here - the pipeline calls ``last_batch_id`` (replay
    guard), ``vacuum`` (periodic snapshot GC), and ``batch_meta`` (replayed
    batches report their original sink count) in addition to the
    read/merge pair, so an alternative backend that satisfies this
    Protocol is guaranteed to work at runtime."""

    def read_state(self, spec: StateTableSpec) -> DataFrame: ...

    def merge_batch(
        self,
        spec: StateTableSpec,
        batch_agg: DataFrame,
        batch_id: int,
        now: str | None = None,
        meta: dict | None = None,
    ) -> None: ...

    def last_batch_id(self, spec: StateTableSpec) -> int: ...

    def batch_meta(self, spec: StateTableSpec, batch_id: int) -> dict | None: ...

    def vacuum(self, spec: StateTableSpec) -> int: ...


class ParquetStateStore:
    """Hash-bucketed versioned-parquet state store with atomic pointer
    swap and bucket-pruned merges."""

    # Merges to DIFFERENT tables may run from concurrent driver threads:
    # each table has its own pointer file and snapshot dirs, and Spark's
    # scheduler interleaves the jobs. (A JDBC/DuckDB backend whose single
    # connection is not thread-safe leaves this False.)
    supports_concurrent_merges = True

    def __init__(self, spark: SparkSession, root: str, n_buckets: int = 16) -> None:
        self.spark = spark
        self.root = root
        self.n_buckets = n_buckets
        os.makedirs(root, exist_ok=True)

    # --- pointer management -------------------------------------------------
    def _pointer_path(self, table: str) -> str:
        return os.path.join(self.root, table, "_LATEST.json")

    @contextlib.contextmanager
    def _table_write_lock(self, table: str):
        """Serialize WRITERS (merge/rebucket/migrate/vacuum) on one
        table, across processes and threads (round-13 two-writer axis).

        Pre-lock, concurrent ``merge_batch`` calls on the SAME table
        were a silent-loss race: both read the same pointer, both wrote
        ``v=next_version``, and the second pointer swap clobbered the
        first writer's versions map - a whole batch vanished with zero
        errors (and racing replicas replaying the same batch_id could
        double-apply past the TOCTOU ledger check). ``fcntl.flock`` is
        the arbiter: kernel-released on crash (no stale-lock sweeper),
        exclusive across processes AND across fds within one process
        (each acquire opens its own fd, so driver threads contend too),
        ~microseconds uncontended. Writers to DIFFERENT tables keep
        their concurrency (per-table lock file) - the pipeline's three
        parallel merges are unaffected. READERS never take it: the
        atomic pointer protocol already serves them. Scope: local/NFSv4
        filesystems; multi-writer on an object store is a lakehouse
        format's job (SCALING.md)."""
        import fcntl

        path = os.path.join(self.root, table, "_WRITER.lock")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd = os.open(path, os.O_CREAT | os.O_RDWR, 0o644)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            os.close(fd)  # close releases the flock

    def _read_pointer(self, table: str) -> dict:
        try:
            with open(self._pointer_path(table)) as f:
                return json.load(f)
        except FileNotFoundError:
            # versions: bucket id (str) -> snapshot version of that bucket
            return {
                "versions": {},
                "last_batch_id": -1,
                "next_version": 0,
                "n_buckets": self.n_buckets,
            }

    def _write_pointer(self, table: str, pointer: dict) -> None:
        path = self._pointer_path(table)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path))
        with os.fdopen(fd, "w") as f:
            json.dump(pointer, f)
        os.replace(tmp, path)  # atomic on POSIX

    def _mark_unreferenced(self, table: str, old_versions: dict, buckets=None) -> None:
        """Stamp NOW as the mtime of every bucket snapshot this pointer
        swap supersedes. A bucket dir's natural mtime is its WRITE time
        (merges never touch superseded dirs again), so ``vacuum``'s
        retention window measured against it would reclaim a long-lived
        snapshot the instant it is superseded - breaking the documented
        out-of-band-reader guarantee. Delta measures retention from the
        remove action's deletionTimestamp (unreference time); ``os.utime``
        at swap time gives the same semantics with no extra state.
        Best-effort: a dir already gone (concurrent vacuum) is skipped."""
        for path in self._bucket_paths(table, old_versions, buckets):
            try:
                os.utime(path)
            except OSError:
                pass

    def _bucket_expr(self, spec: StateTableSpec, n_buckets: int):
        return F.pmod(
            F.xxhash64(*[F.col(c) for c in spec.key_cols]), F.lit(n_buckets)
        )

    def _bucket_paths(self, table: str, versions: dict, buckets=None) -> list[str]:
        return [
            os.path.join(self.root, table, f"v={v}", f"_bucket={b}")
            for b, v in sorted(versions.items(), key=lambda kv: int(kv[0]))
            if buckets is None or int(b) in buckets
        ]

    # --- public API ----------------------------------------------------------
    def last_batch_id(self, spec: StateTableSpec) -> int:
        return self._read_pointer(spec.name)["last_batch_id"]

    def batch_meta(self, spec: StateTableSpec, batch_id: int) -> dict | None:
        """Caller-supplied metadata recorded with the LATEST merge (e.g.
        the sink's emitted-row count), or None for any other batch. One
        entry only, by design: a stream restart replays exactly the last
        uncommitted micro-batch, and the pointer stays O(1) regardless of
        stream length; callers keep a slow-path fallback for older ids."""
        pointer = self._read_pointer(spec.name)
        bm = pointer.get("batch_meta")
        if bm and bm.get("batch_id") == batch_id:
            return bm.get("meta")
        return None

    def bucket_versions(self, spec: StateTableSpec) -> dict:
        """bucket -> version map (introspection; tests use it to prove
        untouched buckets are not rewritten)."""
        return dict(self._read_pointer(spec.name)["versions"])

    def read_state(self, spec: StateTableSpec, buckets=None) -> DataFrame:
        pointer = self._read_pointer(spec.name)
        paths = self._bucket_paths(spec.name, pointer["versions"], buckets)
        if not paths:
            return self.spark.createDataFrame([], spec.schema)
        # Page-CRC verification ON for state reads (round-13 footer/bit-rot
        # axis): snappy framing and strict decoders catch most corruption,
        # but a flipped byte that keeps the page a VALID stream decodes to
        # silently wrong state (reproduced: a PLAIN int64 page read back
        # wrong-by-one with zero errors). parquet-mr writes page CRCs by
        # default; only verification is off by default (PARQUET-1580).
        # State is cumulative and irreplaceable - worth the crc32 cost;
        # bulk fact scans stay default (recomputable).
        df = (
            self.spark.read.schema(spec.schema)
            .option("parquet.page.verify-checksum.enabled", "true")
            .parquet(*paths)
        )
        # Lazy-migration convergence (round-13 verdict task #6): a
        # counter column added by schema skew is missing from
        # pre-evolution snapshots and resolves as NULL - but a counter's
        # migration default is typed 0 (``migrate_schema`` backfills 0
        # for sum_cols; ``merge_batch`` coalesces NULL counters to 0),
        # so coalescing here makes the lazy upgrade read IDENTICAL to an
        # eager ``migrate_schema``, removing the pinned NULL-vs-0
        # divergence for untouched keys. Safe because a NULL sum_col has
        # no other source: every write path lands a concrete value.
        # Non-counter columns keep NULL (their migration default).
        for c in spec.sum_cols:
            f = spec.schema[c]
            df = df.withColumn(
                c, F.coalesce(F.col(c), F.lit(0).cast(f.dataType))
            )
        return df.select(*spec.schema.fieldNames())

    def vacuum(self, spec: StateTableSpec, retention_seconds: float = 0.0) -> int:
        """Delete bucket snapshots no longer referenced by the pointer
        (the Delta ``VACUUM`` analog). The pointer swap is atomic, so
        every NEW read resolves only referenced paths - but a lazy
        DataFrame materialized from ``read_state`` BEFORE a merge
        superseded its snapshot still scans the old paths, exactly like
        a long-running query over a Delta table another writer vacuums.
        ``retention_seconds`` is the Delta retention analog: snapshots
        unreferenced for less than that long are spared, so out-of-band
        readers are safe as long as their queries finish within the
        window. The clock starts at UNREFERENCE time (the pointer swap
        ``os.utime``s superseded dirs - Delta's deletionTimestamp
        analog), not write time, so a snapshot referenced longer than
        the window is still spared for a full window after it is
        superseded. The default 0 keeps immediate reclamation - correct
        for the single-threaded foreachBatch pipeline, where vacuum and
        all reads share one thread. Returns the number of snapshot
        directories this call removed (a dir already deleted by a
        concurrent vacuum is not counted). Holds the per-table writer
        lock (round-13): vacuum mutates the snapshot set, so it
        serializes with merges/reshapes on the same table."""
        with self._table_write_lock(spec.name):
            return self._vacuum_locked(spec, retention_seconds)

    def _vacuum_locked(self, spec, retention_seconds: float) -> int:
        import glob as _glob
        import shutil
        import time as _time

        pointer = self._read_pointer(spec.name)
        live = {
            os.path.join(self.root, spec.name, f"v={v}", f"_bucket={b}")
            for b, v in pointer["versions"].items()
        }
        cutoff = _time.time() - retention_seconds
        removed = 0
        for bdir in _glob.glob(
            os.path.join(self.root, spec.name, "v=*", "_bucket=*")
        ):
            if bdir not in live:
                try:
                    if os.path.getmtime(bdir) > cutoff:
                        continue  # inside the retention window
                except OSError:
                    continue  # already gone (concurrent vacuum): not ours to count
                # Atomic CLAIM before delete: two vacuums racing on the
                # same dir would otherwise both pass the getmtime probe
                # and both count the rmtree (ignore_errors hides the
                # loser's no-op). os.rename is atomic on POSIX, so
                # exactly one claimer wins; losers skip. A tombstone
                # orphaned by a crash mid-delete self-heals: it is never
                # in ``live``, keeps the stale mtime (rename preserves
                # it), and is reclaimed by any later vacuum pass.
                tomb = f"{bdir}.vacuum.{os.getpid()}.{threading.get_ident()}"
                try:
                    os.rename(bdir, tomb)
                except OSError:
                    continue  # lost the claim to a concurrent vacuum
                shutil.rmtree(tomb, ignore_errors=True)
                removed += 1
        for vdir in _glob.glob(os.path.join(self.root, spec.name, "v=*")):
            try:
                empty = not any(
                    e.startswith("_bucket=") for e in os.listdir(vdir)
                )
            except OSError:
                continue  # a concurrent vacuum already removed it
            if not empty:
                continue
            # A version dir with no _bucket= children is NOT necessarily
            # garbage: a concurrent writer's brand-new v= dir holds only
            # the output committer's _temporary tree - or, for the first
            # instants after mkdirs, NOTHING AT ALL - until the first
            # bucket commits. The round-12 multi-PROCESS axis caught this
            # sweep rmtree-ing _temporary out from under an in-flight
            # cross-process merge (TASK_WRITE_FAILED on the writer), and
            # the full-suite run then hit the narrower bare-dir variant
            # (listdir raced between the writer's mkdirs and its first
            # _temporary file). So under a retention window - the
            # documented concurrent-safe mode - EVERY empty vdir younger
            # than the cutoff is spared (in-flight dirs are always
            # fresh; crash orphans go stale and reclaim after the
            # window). With retention 0 the caller is asserting the
            # single-writer context (the foreachBatch pipeline), where
            # nothing can be in flight during vacuum: bare-empty dirs
            # sweep immediately as before, while _temporary-bearing
            # ones keep a small FIXED grace (_IN_FLIGHT_GRACE_S) - at
            # retention 0 the plain cutoff equals now() and would spare
            # nothing (round-12 advice), so without the floor a
            # mis-assumed "single writer" could sweep a live commit
            # tree; a crashed writer's orphan goes stale past the grace
            # and reclaims on the next pass.
            try:
                in_flight = "_temporary" in os.listdir(vdir)
                spare_cutoff = (
                    cutoff
                    if retention_seconds > 0
                    else _time.time() - _IN_FLIGHT_GRACE_S
                )
                if in_flight and os.path.getmtime(vdir) > spare_cutoff:
                    continue
                if (
                    retention_seconds > 0
                    and os.path.getmtime(vdir) > cutoff
                ):
                    continue
            except OSError:
                continue  # already gone (concurrent vacuum)
            shutil.rmtree(vdir, ignore_errors=True)
        return removed

    def rebucket(self, spec: StateTableSpec, new_n_buckets: int) -> int:
        """Migrate the table to a different hash-bucket count - the
        documented path for a key-cardinality jump (SCALING.md known
        limit: bucket count was fixed at table creation; a 100x key
        jump needs more buckets for merge pruning to keep per-batch
        I/O localized, and a shrink compacts an over-bucketed table).

        One full read -> re-hash -> one atomically-swapped new version:
        the same pointer dance as a merge, so concurrent READERS are
        never torn, and ``last_batch_id``/``batch_meta`` carry over so
        replay idempotency is unaffected. Content is preserved exactly
        (same rows, same counters - pinned bit-identical by
        tests/test_state_store.py); only the _bucket assignment
        changes. Old snapshots become unreferenced and are reclaimed by
        ``vacuum()``. Returns the number of non-empty buckets written.

        Concurrency (round-13): holds the per-table writer lock, so a
        rebucket serializes against merges/vacuums on the same table
        instead of the previous last-write-wins pointer race.
        """
        with self._table_write_lock(spec.name):
            return self._rebucket_locked(spec, new_n_buckets)

    def _rebucket_locked(self, spec, new_n_buckets: int) -> int:
        if new_n_buckets < 1:
            raise ValueError(f"new_n_buckets must be >= 1, got {new_n_buckets}")
        pointer = self._read_pointer(spec.name)
        version = pointer["next_version"]
        out = os.path.join(self.root, spec.name, f"v={version}")
        current = self.read_state(spec)
        (
            current.select(*spec.schema.fieldNames())
            .withColumn("_bucket", self._bucket_expr(spec, new_n_buckets))
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(out)
        )
        # only buckets that physically exist enter the pointer: an empty
        # bucket writes no directory, and a registered-but-missing path
        # would crash every subsequent read_state
        try:
            written = sorted(
                int(d.split("=", 1)[1])
                for d in os.listdir(out)
                if d.startswith("_bucket=")
            )
        except FileNotFoundError:  # empty state: no dir at all
            written = []
        self._write_pointer(
            spec.name,
            {
                **pointer,
                "versions": {str(b): version for b in written},
                "next_version": version + 1,
                "n_buckets": new_n_buckets,
            },
        )
        # every pre-migration snapshot is superseded at once: start its
        # retention clock now (unreference time), not at its write time
        self._mark_unreferenced(spec.name, pointer["versions"])
        return len(written)

    def migrate_schema(
        self, old_spec: StateTableSpec, new_spec: StateTableSpec
    ) -> int:
        """Evolve the table to ``new_spec``'s schema - the lakehouse
        ALTER TABLE (a long-lived pipeline WILL add a counter; the
        reference's Postgres tables would take DDL, sql/postgres_tables
        .sql:3-25, and a 100 TB parquet state cannot be dropped and
        re-accumulated).

        Rules: key columns are the table's identity and must be
        UNCHANGED (a key change is a different table - create one and
        backfill). Added ``sum_cols`` are filled with typed 0 so reads
        and additive merges work immediately; other added columns fill
        NULL; dropped columns discard their data; a same-named column
        whose type changed is ``cast`` (caller owns cast safety -
        widenings are safe, narrowings are on them).

        Same pointer dance as ``rebucket``: one full read -> project ->
        one atomically-swapped new version, so concurrent readers are
        never torn; ``last_batch_id`` carries over, so replaying a
        pre-migration batch id stays a no-op; old snapshots start their
        retention clock at the swap and fall to ``vacuum``. Returns the
        number of non-empty buckets written.

        Concurrency (round-13): holds the per-table writer lock, so a
        migration serializes against merges/vacuums on the same table
        instead of the previous last-write-wins pointer race.
        """
        with self._table_write_lock(old_spec.name):
            return self._migrate_schema_locked(old_spec, new_spec)

    def _migrate_schema_locked(self, old_spec, new_spec) -> int:
        if old_spec.name != new_spec.name:
            raise ValueError(
                f"migrate_schema evolves one table in place: "
                f"{old_spec.name!r} != {new_spec.name!r}"
            )
        if tuple(old_spec.key_cols) != tuple(new_spec.key_cols):
            raise ValueError(
                "key columns are the table's identity and cannot be "
                f"migrated: {old_spec.key_cols} -> {new_spec.key_cols}"
            )
        pointer = self._read_pointer(old_spec.name)
        version = pointer["next_version"]
        out = os.path.join(self.root, old_spec.name, f"v={version}")
        old_cols = set(old_spec.schema.fieldNames())
        proj = []
        for f in new_spec.schema.fields:
            if f.name in old_cols:
                proj.append(F.col(f.name).cast(f.dataType).alias(f.name))
            elif f.name in new_spec.sum_cols:
                proj.append(F.lit(0).cast(f.dataType).alias(f.name))
            else:
                proj.append(F.lit(None).cast(f.dataType).alias(f.name))
        (
            self.read_state(old_spec)
            .select(*proj)
            # keys unchanged => bucket assignment unchanged; rewrite is
            # still all-buckets because every file's schema changes
            .withColumn("_bucket", self._bucket_expr(new_spec, pointer["n_buckets"]))
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(out)
        )
        try:
            written = sorted(
                int(d.split("=", 1)[1])
                for d in os.listdir(out)
                if d.startswith("_bucket=")
            )
        except FileNotFoundError:  # empty state
            written = []
        self._write_pointer(
            old_spec.name,
            {
                **pointer,
                "versions": {str(b): version for b in written},
                "next_version": version + 1,
            },
        )
        self._mark_unreferenced(old_spec.name, pointer["versions"])
        return len(written)

    def merge_batch(
        self,
        spec: StateTableSpec,
        batch_agg: DataFrame,
        batch_id: int,
        now: str | None = None,
        meta: dict | None = None,
    ) -> None:
        """Additively merge one batch's aggregates into cumulative state.

        Semantics of the reference UPSERT (``Mechanism Y.py:152-160`` etc.):
        new keys insert; existing keys add counters; ``last_updated`` is
        refreshed for touched keys. Null counters coalesce to 0
        (``Mechanism Y.py:178``). Skips already-applied batch_ids.

        ``meta`` (small JSON-serializable dict) is recorded in the pointer
        atomically with the merge and readable back via ``batch_meta`` -
        the crash-safe channel for per-batch facts like the sink's
        emitted-row count.

        I/O: reads and rewrites only the hash buckets that contain keys
        present in the batch; every other bucket keeps its current
        snapshot version untouched.

        Concurrency: the whole merge - replay check, snapshot write,
        pointer swap - holds the per-table writer lock, so two writers
        on one table SERIALIZE (racing replicas of the same batch_id
        become exactly-once: the loser re-reads the pointer under the
        lock and sees the batch applied). See ``_table_write_lock``.
        """
        with self._table_write_lock(spec.name):
            return self._merge_batch_locked(spec, batch_agg, batch_id, now, meta)

    def _merge_batch_locked(self, spec, batch_agg, batch_id, now, meta) -> None:
        pointer = self._read_pointer(spec.name)
        if batch_id <= pointer["last_batch_id"]:
            return  # replayed batch: already merged, keep idempotent
        n_buckets = pointer["n_buckets"]
        batch_meta = {"batch_id": batch_id, "meta": meta} if meta is not None else None

        ts = F.to_timestamp(F.lit(now)) if now else F.current_timestamp()
        # NULL-keyed aggregate rows are EXCLUDED from keyed state: a NULL
        # key is an unattributable upstream row (e.g. a malformed CSV line
        # PERMISSIVE-nulled into the batch), not a key. This is the PK
        # semantics the reference's Postgres table enforced - except there
        # the violation CRASHED the stream on every replay (poison pill);
        # here the row simply never enters state. The DuckDB backend
        # applies the identical WHERE so both backends agree (pinned by
        # test_null_keyed_rows_excluded_both_backends).
        key_not_null = F.lit(True)
        for k in spec.key_cols:
            key_not_null = key_not_null & F.col(k).isNotNull()
        batch_side = (
            batch_agg.filter(key_not_null)
            .withColumn("last_updated", ts)
            .withColumn("_bucket", self._bucket_expr(spec, n_buckets))
            .persist()
        )
        try:
            # metadata-sized collect: one row per touched bucket
            touched = {
                int(r["_bucket"])
                for r in batch_side.select("_bucket").distinct().collect()
            }
            if not touched:
                self._write_pointer(
                    spec.name,
                    {
                        **pointer,
                        "last_batch_id": batch_id,
                        "batch_meta": batch_meta,
                    },
                )
                return

            current = self.read_state(spec, buckets=touched)
            # Union + re-aggregate == distributed ON CONFLICT additive merge,
            # restricted to the touched buckets.
            merged = (
                current.select(*spec.schema.fieldNames())
                .unionByName(batch_side.select(*spec.schema.fieldNames()))
                .groupBy(*spec.key_cols)
                .agg(
                    *[
                        _checked_counter_total(c, spec.schema[c].dataType)
                        for c in spec.sum_cols
                    ],
                    F.max("last_updated").alias("last_updated"),
                )
                .select(*spec.schema.fieldNames())
                .withColumn("_bucket", self._bucket_expr(spec, n_buckets))
            )

            version = pointer["next_version"]
            out = os.path.join(self.root, spec.name, f"v={version}")
            merged.write.mode("overwrite").partitionBy("_bucket").parquet(out)
            versions = dict(pointer["versions"])
            versions.update({str(b): version for b in touched})
            self._write_pointer(
                spec.name,
                {
                    "versions": versions,
                    "last_batch_id": batch_id,
                    "next_version": version + 1,
                    "n_buckets": n_buckets,
                    "batch_meta": batch_meta,
                },
            )
            # retention clock starts at UNREFERENCE time, not write time
            self._mark_unreferenced(spec.name, pointer["versions"], touched)
        finally:
            batch_side.unpersist()
