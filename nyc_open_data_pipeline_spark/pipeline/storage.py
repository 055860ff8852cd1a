"""Parquet table storage: create / append / upsert (MERGE) / metadata / export.

Re-expresses the reference's PostgreSQL storage layer (src/ingestion/
storage.py) on partitioned parquet:

- K1 DDL-from-schema (:73-183)  -> TableSchema-driven writes, indexes become
  partition columns (partition pruning replaces index scans, SURVEY §4)
- K2 append insert  (:185-228)  -> mode('append')
- K3 upsert/MERGE   (:230-297)  -> partition-pruned anti-join + dynamic
  partition overwrite (``INSERT ... ON CONFLICT DO UPDATE`` semantics:
  incoming rows win); full atomic-swap rewrite only for unpartitioned tables
- K4 metadata upsert (:51-71,299-334) -> tiny _dataset_metadata table
- K5 parquet export  (:336-382) -> snappy parquet (native)

At 100 TB the upsert rewrite is bounded by partition pruning: only
partitions containing incoming keys are read and rewritten (pass
``partition_by`` so the anti-join's scan prunes).
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import socket
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_open_data_pipeline_spark.pipeline.schema import TableSchema


class WriterFencedError(RuntimeError):
    """A writer's table lock was taken over (stale-lock rule) before it
    reached its commit point; the commit is refused so the takeover
    winner's state can't be clobbered by a zombie."""


class LockTimeoutError(TimeoutError):
    """Could not acquire the per-table writer lock within ``lock_timeout``."""


@dataclass
class ParquetStorage:
    root: str
    # Commit protocol (round 12): writes to one table serialize on a lock
    # DIRECTORY (os.mkdir is atomic on POSIX and on object-store FUSE
    # mounts that map mkdir to an atomic PUT-if-absent). A crashed writer's
    # lock is taken over once it is older than ``lock_stale_after`` AND its
    # recorded pid is dead (pid liveness is only checkable same-host; a
    # different host falls back to age alone). ``lock_timeout`` bounds how
    # long a second writer waits before raising. The reference gets this
    # serialization free from Postgres transactions
    # (/root/reference/src/ingestion/storage.py:230-297).
    lock_timeout: float = 60.0
    lock_stale_after: float = 300.0

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    # ------------------------------------------------------------------
    # writer lock + generation marker
    # ------------------------------------------------------------------

    def _lock_dir(self, table: str) -> str:
        return self.path(table) + "__lock"

    def _acquire_lock(self, table: str) -> str:
        """Take the per-table writer lock; returns an ownership token.
        Stale takeover: a lock whose owner file is older than
        ``lock_stale_after`` and whose pid is provably dead (same host) —
        or unreadably corrupt and old — is broken and re-contended."""
        lock = self._lock_dir(table)
        token = uuid.uuid4().hex
        os.makedirs(os.path.dirname(lock) or ".", exist_ok=True)
        deadline = time.monotonic() + self.lock_timeout
        while True:
            try:
                os.mkdir(lock)
            except FileExistsError:
                if self._lock_is_stale(lock):
                    # Break by RENAME-then-delete: only the contender whose
                    # rename succeeds removes the stale dir. A bare rmtree
                    # here could land AFTER another contender already broke
                    # the lock and re-acquired it — deleting the winner's
                    # brand-new lock and leaving two live owners (round-12
                    # review).
                    doomed = f"{lock}.breaking_{uuid.uuid4().hex[:8]}"
                    try:
                        os.rename(lock, doomed)
                    except OSError:
                        continue  # someone else broke it first: re-contend
                    shutil.rmtree(doomed, ignore_errors=True)
                    continue
                if time.monotonic() >= deadline:
                    raise LockTimeoutError(
                        f"writer lock on {table!r} held past lock_timeout="
                        f"{self.lock_timeout}s ({lock})"
                    ) from None
                time.sleep(0.05)
                continue
            owner = {
                "token": token,
                "pid": os.getpid(),
                "host": socket.gethostname(),
                "ts": time.time(),
            }
            with open(os.path.join(lock, "owner.json"), "w") as f:
                json.dump(owner, f)
            return token

    def _lock_is_stale(self, lock: str) -> bool:
        try:
            owner_path = os.path.join(lock, "owner.json")
            age = time.time() - os.stat(owner_path).st_mtime
        except OSError:
            # mkdir'd but owner.json not written yet (acquire in flight) —
            # stale only if the bare dir itself has sat for the full window.
            try:
                age = time.time() - os.stat(lock).st_mtime
            except OSError:
                return False  # vanished: re-contend
            return age > self.lock_stale_after
        if age <= self.lock_stale_after:
            return False
        try:
            with open(owner_path) as f:
                owner = json.load(f)
        except (OSError, ValueError):
            return True  # old AND unreadable: corrupt leftover
        if owner.get("host") != socket.gethostname():
            return True  # cross-host: age is the only signal
        try:
            os.kill(int(owner["pid"]), 0)
        except (ProcessLookupError, ValueError):
            return True  # owner process is gone
        except PermissionError:
            pass  # alive under another uid
        return False  # old but owner still alive: long write, keep waiting

    def _owns_lock(self, table: str, token: str) -> bool:
        try:
            with open(os.path.join(self._lock_dir(table), "owner.json")) as f:
                return json.load(f).get("token") == token
        except (OSError, ValueError):
            return False

    def _check_fence(self, table: str, token: str) -> None:
        """Commit-point fence: a writer that lost its lock to a stale-lock
        takeover must not publish. Called immediately before the renames /
        dynamic-overwrite commit so the zombie window is one syscall wide,
        not the whole (possibly minutes-long) Spark write."""
        if not self._owns_lock(table, token):
            raise WriterFencedError(
                f"lock on {table!r} was taken over mid-write; aborting commit"
            )

    def _release_lock(self, table: str, token: str) -> None:
        if self._owns_lock(table, token):
            shutil.rmtree(self._lock_dir(table), ignore_errors=True)

    @contextlib.contextmanager
    def _locked(self, table: str):
        token = self._acquire_lock(table)
        try:
            yield token
        finally:
            self._release_lock(table, token)

    GEN_FILE = "_generation"

    def generation(self, table: str) -> int:
        """Monotonic commit counter for a table (0 = never committed via
        the protocol). Stored as ``_generation`` inside the table dir —
        underscore-prefixed, so parquet readers ignore it."""
        try:
            with open(os.path.join(self.path(table), self.GEN_FILE)) as f:
                return int(json.load(f)["gen"])
        except (OSError, ValueError, KeyError):
            return 0

    def _write_generation(self, dirpath: str, gen: int, token: str) -> None:
        # tmp + atomic replace: an in-place truncate-write would let a crash
        # or concurrent reader see a torn file, which generation() reads as
        # 0 — breaking monotonicity (round-12 review)
        dest = os.path.join(dirpath, self.GEN_FILE)
        tmp = f"{dest}.tmp_{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump({"gen": gen, "writer": token, "ts": time.time()}, f)
        os.replace(tmp, dest)

    def exists(self, table: str) -> bool:
        self._recover(table)
        p = self.path(table)
        return os.path.exists(p) and any(
            not f.startswith(("_", ".")) for f in os.listdir(p)
        )

    def _recover(self, table: str) -> None:
        """Crash recovery for the atomic swap: ``_atomic_write`` renames
        final -> __old_x then tmp -> final. A crash inside that window
        leaves no final dir but an intact __old_x — restore the newest one
        so a restarted writer MERGES into the previous state instead of
        silently starting a fresh table (the data-loss mode a streaming
        foreachBatch replay would otherwise hit). Orphaned __old_x dirs
        alongside a live final are leftover garbage from a crash after the
        swap — ignored here, removed by the next successful swap's path."""
        final = self.path(table)
        if os.path.exists(final):
            return
        parent, base = os.path.dirname(final) or ".", os.path.basename(final)
        if not os.path.exists(parent):
            return
        olds = [
            os.path.join(parent, d)
            for d in os.listdir(parent)
            if d.startswith(f"{base}__old_")
        ]
        if olds:
            try:
                os.rename(max(olds, key=os.path.getmtime), final)
            except OSError:
                # lost a race with a concurrent writer completing its swap
                # (this reader saw the one-syscall-wide no-final window);
                # the writer's final state is the correct one — keep it.
                pass

    # ------------------------------------------------------------------
    # writes
    # ------------------------------------------------------------------

    def create_or_append(self, df: DataFrame, schema: TableSchema) -> None:
        """K2: append (creates on first write). Casts to the declared schema
        first — the declared-schema contract of K1. Serialized per table by
        the writer lock (two appends never interleave their job commits)."""
        out = conform(df, schema)
        with self._locked(schema.table_name) as token:
            writer = out.write.mode("append")
            if schema.partition_by:
                writer = writer.partitionBy(
                    *[c for c in schema.partition_by if c in out.columns]
                )
            # fence before the append job (its commit IS the publish) and
            # again before stamping the generation — a zombie that lost a
            # stale-lock takeover must not publish (round-12 review: this
            # path lacked the fence the other write paths have)
            self._check_fence(schema.table_name, token)
            writer.parquet(self.path(schema.table_name))
            self._check_fence(schema.table_name, token)
            self._write_generation(
                self.path(schema.table_name), self.generation(schema.table_name) + 1, token
            )

    def upsert(self, spark: SparkSession, df: DataFrame, schema: TableSchema) -> int:
        """K3 MERGE: keep existing rows whose keys don't collide (anti-join),
        union the incoming batch (incoming wins — ``DO UPDATE SET ... =
        excluded.*``). Falls back to append when no unique_keys configured
        (reference ingest_data.py:136-150).

        Partitioned tables take the pruned path: only partitions containing
        incoming rows are read, merged, and rewritten (dynamic partition
        overwrite) — a 1-row upsert into a 100 TB table touches one
        partition, not the table. Contract: partition values must be stable
        per unique key (a key may not move between partitions), the same
        contract Hive-style dynamic-overwrite MERGEs carry; the reference's
        Postgres ON CONFLICT has no partitions so the question doesn't arise
        there. Unpartitioned tables fall back to the full anti-join +
        atomic-swap rewrite.

        Idempotent: re-upserting the same batch is a no-op by construction.
        Concurrent-writer safe (round 12): the read-merge-swap runs under
        the per-table writer lock, so two simultaneous upserts serialize —
        the second reads the first's committed state instead of racing the
        swap renames; a writer that loses its lock to a stale-lock takeover
        is fenced at the commit point. Returns the resulting row count.
        """
        keys = schema.unique_keys
        incoming = conform(df, schema)
        with self._locked(schema.table_name) as token:
            if not keys or not self.exists(schema.table_name):
                if keys:
                    incoming = dedup_first(incoming, keys)
                self._atomic_write(incoming, schema, token)
                return self._count(spark, schema.table_name)

            incoming = dedup_first(incoming, keys)
            parts = [c for c in schema.partition_by if c in incoming.columns]
            if parts:
                n = self._upsert_pruned(spark, incoming, schema, keys, parts, token)
            else:
                existing = spark.read.parquet(self.path(schema.table_name))
                survivors = existing.join(
                    incoming.select(*keys).distinct(), on=keys, how="left_anti"
                )
                merged = survivors.unionByName(incoming, allowMissingColumns=True)
                self._atomic_write(merged, schema, token)
                n = self._count(spark, schema.table_name)
            return n

    def _upsert_pruned(
        self,
        spark: SparkSession,
        incoming: DataFrame,
        schema: TableSchema,
        keys: list[str],
        parts: list[str],
        token: str,
    ) -> int:
        """Partition-pruned MERGE: read only the partitions the incoming
        batch touches (Catalyst prunes the scan to those directories), merge,
        and dynamically overwrite exactly those partitions. Untouched
        partitions' files are never read or rewritten."""
        # the touched-partition list is tiny (one tuple per partition) — a
        # driver-side scalar like the reference's batch bookkeeping
        touched = incoming.select(*parts).distinct().collect()
        pred = None
        for row in touched:
            clause = None
            for p in parts:
                c = F.col(p).eqNullSafe(F.lit(row[p]))
                clause = c if clause is None else clause & c
            pred = clause if pred is None else pred | clause

        existing = spark.read.parquet(self.path(schema.table_name))
        pruned = existing.filter(pred) if pred is not None else existing.limit(0)
        survivors = pruned.join(incoming.select(*keys).distinct(), on=keys, how="left_anti")
        merged = survivors.unionByName(incoming, allowMissingColumns=True)

        # Spark rejects overwriting a path that appears in the read plan, so
        # stage the merged slice (bounded by the touched partitions, not the
        # table) and re-read it for the dynamic overwrite.
        final = self.path(schema.table_name)
        stage = f"{final}__stage_{uuid.uuid4().hex[:8]}"
        merged.write.parquet(stage)
        try:
            self._check_fence(schema.table_name, token)
            # per-WRITER option, not the session conf: the table locks only
            # serialize same-table writers, and a session-conf set/restore
            # races a concurrent other-table overwrite into STATIC mode —
            # which truncates every partition the batch doesn't carry
            # (round-12 review)
            (
                spark.read.parquet(stage)
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(*parts)
                .parquet(final)
            )
            self._write_generation(final, self.generation(schema.table_name) + 1, token)
        finally:
            shutil.rmtree(stage, ignore_errors=True)
        return self._count(spark, schema.table_name)

    def delete_keys(self, spark: SparkSession, keys_df: DataFrame, schema: TableSchema) -> int:
        """Targeted delete (right-to-erasure / correction retractions): remove
        every stored row whose unique key appears in ``keys_df`` — the inverse
        of ``upsert``, sharing its scale contract. If the key batch carries
        the table's partition columns, only the touched partitions are read,
        anti-joined, and dynamically overwritten (a delete of one user from a
        100 TB table touches that user's partitions, not the table);
        otherwise the full anti-join + atomic-swap rewrite runs. Returns the
        resulting row count. Idempotent: re-deleting the same keys is a no-op."""
        keys = schema.unique_keys
        if not keys:
            raise ValueError("delete_keys requires unique_keys on the schema")
        if not self.exists(schema.table_name):
            return 0
        wanted = keys_df.select(
            *[c for c in keys_df.columns if c in set(keys) | set(schema.partition_by)]
        ).distinct()
        parts = [c for c in schema.partition_by if c in wanted.columns]
        final = self.path(schema.table_name)
        with self._locked(schema.table_name) as token:
            if parts:
                touched = wanted.select(*parts).distinct().collect()
                pred = None
                for row in touched:
                    clause = None
                    for p in parts:
                        c = F.col(p).eqNullSafe(F.lit(row[p]))
                        clause = c if clause is None else clause & c
                    pred = clause if pred is None else pred | clause
                existing = spark.read.parquet(final)
                pruned = existing.filter(pred) if pred is not None else existing.limit(0)
                survivors = pruned.join(wanted.select(*keys), on=keys, how="left_anti")
                stage = f"{final}__stage_{uuid.uuid4().hex[:8]}"
                survivors.write.parquet(stage)
                try:
                    self._check_fence(schema.table_name, token)
                    (
                        spark.read.parquet(stage)
                        .write.mode("overwrite")
                        .option("partitionOverwriteMode", "dynamic")
                        .partitionBy(*parts)
                        .parquet(final)
                    )
                    self._write_generation(
                        final, self.generation(schema.table_name) + 1, token
                    )
                finally:
                    shutil.rmtree(stage, ignore_errors=True)
            else:
                existing = spark.read.parquet(final)
                survivors = existing.join(wanted.select(*keys), on=keys, how="left_anti")
                self._atomic_write(survivors, schema, token)
            return self._count(spark, schema.table_name)

    def vacuum(self, table: str) -> list[str]:
        """Remove orphaned work directories a crashed writer left behind:
        ``__tmp_*`` / ``__stage_*`` always (never live after a successful
        write), ``__old_*`` only when the final directory exists (when it
        does NOT, the old dir is the recovery source — see ``_recover``).
        Listing-only, no data read; returns the removed paths."""
        self._recover(table)
        final = self.path(table)
        parent, base = os.path.dirname(final) or ".", os.path.basename(final)
        removed: list[str] = []
        if not os.path.exists(parent):
            return removed
        for d in os.listdir(parent):
            full = os.path.join(parent, d)
            if not os.path.isdir(full):
                continue
            if d.startswith(
                (f"{base}__tmp_", f"{base}__stage_", f"{base}__lock.breaking_")
            ) or (
                d.startswith(f"{base}__old_") and os.path.exists(final)
            ):
                shutil.rmtree(full, ignore_errors=True)
                removed.append(full)
        return removed

    def purge_partitions(self, schema: TableSchema, keep) -> list[dict]:
        """Retention purge: drop whole Hive-style partitions whose values
        fail the ``keep`` predicate (a callable over the partition-value
        dict, e.g. ``lambda v: int(v["year"]) >= 2020``). Metadata-only at
        any scale — directories are enumerated and removed; no data file is
        ever read. Returns the dropped partition-value dicts. This is the
        parquet-layout form of ``ALTER TABLE ... DROP PARTITION``; with a
        transactional format the same predicate drives a metadata delete."""
        if not schema.partition_by:
            raise ValueError("purge_partitions requires a partitioned schema")
        root = self.path(schema.table_name)
        dropped: list[dict] = []

        def walk(d: str, depth: int, values: dict) -> None:
            if depth == len(schema.partition_by):
                if not keep(values):
                    shutil.rmtree(d)
                    dropped.append(dict(values))
                return
            col = schema.partition_by[depth]
            for entry in os.listdir(d):
                if "=" not in entry:
                    continue
                name, _, raw = entry.partition("=")
                if name != col:
                    continue
                walk(os.path.join(d, entry), depth + 1, {**values, col: raw})

        if os.path.exists(root):
            walk(root, 0, {})
        return dropped

    def _atomic_write(self, df: DataFrame, schema: TableSchema, token: str | None = None) -> None:
        """Write to a temp dir, then swap — the closest to transactional
        overwrite plain parquet offers (Delta's MERGE INTO replaces this
        when a transactional format is available). With a lock ``token``,
        the swap is fenced (refused if the lock was taken over during the
        write) and the next generation marker is staged INTO the temp dir,
        so the rename publishes data + generation atomically."""
        final = self.path(schema.table_name)
        tmp = f"{final}__tmp_{uuid.uuid4().hex[:8]}"
        writer = df.write.mode("overwrite")
        if schema.partition_by:
            writer = writer.partitionBy(*[c for c in schema.partition_by if c in df.columns])
        writer.parquet(tmp)
        self._write_generation(
            tmp, self.generation(schema.table_name) + 1, token or "unlocked"
        )
        if token is not None:
            self._check_fence(schema.table_name, token)
        # Swap with a bounded retry: an UNLOCKED concurrent reader's
        # _recover can restore `old` back to `final` inside the one-syscall
        # no-final window, making rename(tmp, final) raise ENOTEMPTY — the
        # writer must win (its merge supersedes the restored state), so
        # re-rename final away and try again (round-12 review: only the
        # reader half of this race was handled).
        old = f"{final}__old_{uuid.uuid4().hex[:8]}"
        if os.path.exists(final):
            os.rename(final, old)
        for attempt in range(3):
            try:
                os.rename(tmp, final)
                break
            except OSError:
                if attempt == 2:
                    raise
                bounce = f"{final}__old_{uuid.uuid4().hex[:8]}"
                try:
                    os.rename(final, bounce)
                except OSError:
                    pass
        if os.path.exists(old):
            shutil.rmtree(old)

    def _count(self, spark: SparkSession, table: str) -> int:
        return spark.read.parquet(self.path(table)).count()

    # ------------------------------------------------------------------
    # K4: dataset metadata
    # ------------------------------------------------------------------

    META_TABLE = "_dataset_metadata"

    def update_metadata(
        self,
        spark: SparkSession,
        dataset_id: str,
        table_name: str,
        record_count: int,
        status: str = "success",
        last_ingestion: str | None = None,
    ) -> None:
        meta_schema = TableSchema(
            table_name=self.META_TABLE,
            unique_keys=["dataset_id"],
        )
        row = spark.createDataFrame(
            [(dataset_id, table_name, last_ingestion, record_count, status)],
            "dataset_id string, table_name string, last_ingestion string, "
            "record_count long, status string",
        )
        self.upsert(spark, row, meta_schema)

    def read_metadata(self, spark: SparkSession) -> DataFrame:
        self._recover(self.META_TABLE)
        return spark.read.parquet(self.path(self.META_TABLE))


def dedup_first(df: DataFrame, keys: list[str]) -> DataFrame:
    """Deterministic per-key dedup of an incoming batch: keep the row that is
    minimal under all-non-key-column ordering (struct comparison is
    lexicographic by field position). Unlike ``dropDuplicates``, the survivor
    does not depend on partitioning or scheduling — re-running the same batch
    always keeps the same row."""
    others = [c for c in df.columns if c not in keys]
    if not others:
        return df.dropDuplicates(keys)
    packed = df.groupBy(*keys).agg(F.min(F.struct(*others)).alias("__row"))
    return packed.select(
        *[F.col(f"__row.{c}").alias(c) if c in others else F.col(c) for c in df.columns]
    )


def conform(df: DataFrame, schema: TableSchema) -> DataFrame:
    """Project + cast to the declared schema where columns are declared;
    keeps undeclared passthrough columns (metadata cols) at the end."""
    if not schema.columns:
        return df
    declared = []
    for c in schema.columns:
        if c.name in df.columns:
            declared.append(F.col(c.name).cast(c.spark_type).alias(c.name))
    extras = [c for c in df.columns if c not in {s.name for s in schema.columns}]
    return df.select(*declared, *extras)
