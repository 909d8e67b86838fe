"""Columnar event store — meepo's RedisEventStore re-expressed as a
date-partitioned parquet log (ref: meepo/apps/eventsourcing/
event_store.py, module path per SURVEY.md §0).

ZSET add             → append to log (batch write / streaming sink)
ZSET dedup-by-pk     → compaction job: latest image per (table, pk)
replay(event, range) → partition-pruned time-range scan, ts order
query(event, pk)     → last-change ts per pk (max aggregate)

100 TB posture: the log partitions by event_date (replay cost ∝ the
time range, never the log length); compaction keeps a separate
latest-snapshot table so point lookups don't scan history; files
target 128–512 MB via coalesce at write.
"""

from __future__ import annotations

import os
import re
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from meepo_spark.schemas import CHANGE_EVENT

# log() layout: the canonical ChangeEvent columns + the event_date
# partition column appended by the write paths.
LOG_SCHEMA = T.StructType(
    list(CHANGE_EVENT.fields) + [T.StructField("event_date", T.DateType())]
)


class EventStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # --- write path -------------------------------------------------
    def append(self, changes: DataFrame) -> None:
        """Append a batch of ChangeEvents to the partitioned log."""
        (
            changes.withColumn("event_date", F.to_date("ts"))
            .write.mode("append")
            .partitionBy("event_date")
            .parquet(self.path)
        )

    def streaming_sink(self, changes: DataFrame, checkpoint: str):
        """Continuous append from a change stream — offsets tracked in
        the checkpoint are the engine's binlog-position resume."""
        return (
            changes.withColumn("event_date", F.to_date("ts"))
            .writeStream.format("parquet")
            .option("path", self.path)
            .option("checkpointLocation", checkpoint)
            .partitionBy("event_date")
        )

    # --- read path ----------------------------------------------------
    def log(self) -> DataFrame:
        reader = self.spark.read
        if os.path.isdir(os.path.join(self.path, "_spark_metadata")):
            # A store populated via streaming_sink() resolves its file
            # list through the sink's _spark_metadata commit log, which
            # expire() does not rewrite — entries for dropped
            # event_date partitions would otherwise fail the read with
            # FileNotFoundException, first at schema inference (footer
            # reads) and then at scan. The explicit schema skips the
            # footer reads; ignoreMissingFiles skips the dangling scan
            # entries. Both are exact here: a file is only ever missing
            # because retention deleted its whole partition.
            reader = reader.schema(LOG_SCHEMA).option("ignoreMissingFiles", "true")
        return reader.parquet(self.path)

    def replay(self, table: str, action: str | None, t0, t1) -> DataFrame:
        """Events for a topic within [t0, t1), ts order — meepo's
        `replay`. The event_date partition filter prunes to the range.
        """
        df = self.log().filter(
            (F.col("table") == table)
            & (F.col("ts") >= F.lit(t0).cast("timestamp"))
            & (F.col("ts") < F.lit(t1).cast("timestamp"))
            & (F.col("event_date") >= F.to_date(F.lit(t0)))
            & (F.col("event_date") <= F.to_date(F.lit(t1)))
        )
        if action is not None:
            df = df.filter(F.col("action") == action)
        return df.orderBy("ts", "offset")

    def last_change(self, table: str) -> DataFrame:
        """Last-change timestamp per pk — meepo's `query` (ZSCORE)."""
        return (
            self.log()
            .filter(F.col("table") == table)
            .groupBy("pk")
            .agg(F.max("ts").alias("last_ts"), F.max("offset").alias("last_offset"))
        )

    # --- maintenance ----------------------------------------------------
    def compact(self, snapshot_path: str) -> DataFrame:
        """Latest image per (table, pk) — the ZSET's dedup-by-pk as a
        periodic job. max_by over (ts, offset) pins the winner even
        for same-ts events; deletes drop out of the snapshot."""
        latest = (
            self.log()
            .groupBy("table", "pk")
            .agg(
                F.max_by(
                    F.struct("action", "row", "ts", "offset"),
                    F.struct("ts", "offset"),
                ).alias("last")
            )
            .select(
                "table",
                "pk",
                F.col("last.action").alias("action"),
                F.col("last.row").alias("row"),
                F.col("last.ts").alias("ts"),
                F.col("last.offset").alias("offset"),
            )
        )
        snap = latest.filter(F.col("action") != "delete")
        snap.write.mode("overwrite").parquet(snapshot_path)
        return self.spark.read.parquet(snapshot_path)

    def rebuild(self, table: str, as_of) -> DataFrame:
        """Table state as of a point in time: replay the log up to
        ``as_of``, keep each pk's latest image, drop deletions —
        meepo's event-sourcing 'rebuild from events' (Entry 3,
        SURVEY.md §3.2)."""
        upto = self.log().filter(
            (F.col("table") == table) & (F.col("ts") <= F.lit(as_of).cast("timestamp"))
        )
        latest = (
            upto.groupBy("pk")
            .agg(
                F.max_by(F.struct("action", "row", "ts", "offset"), F.struct("ts", "offset")).alias(
                    "last"
                )
            )
            .select(
                "pk",
                F.col("last.action").alias("action"),
                F.col("last.row").alias("row"),
                F.col("last.ts").alias("ts"),
            )
        )
        return latest.filter(F.col("action") != "delete").drop("action")

    def expire(self, before) -> list[str]:
        """Retention enforcement: drop whole event_date partitions
        older than ``before`` (a date or 'YYYY-MM-DD' string); returns
        the dropped partition names.

        Deletion is DIRECTORY-level, never row-level: at 100 TB a
        row-filtering rewrite of the log would cost a full read+write
        cycle, while dropping a date partition is a metadata/DEL
        operation whose cost is independent of data volume — the same
        reason replay prunes on event_date. Rows inside a partition
        are all strictly older than any later partition by
        construction (event_date = to_date(ts)), so the cut is exact
        at day granularity.

        Accepts a date, a datetime (truncated to its date), or a
        'YYYY-MM-DD' string. Partition directories whose value is not
        an ISO date (e.g. __HIVE_DEFAULT_PARTITION__ from null-ts
        events) are never aged out — they carry no ordering
        information, so retention cannot prove them expired."""
        import datetime
        import shutil

        if isinstance(before, str):
            cutoff = datetime.date.fromisoformat(before)
        elif isinstance(before, datetime.datetime):
            # datetime subclasses date: truncate instead of letting a
            # date < datetime comparison raise mid-deletion
            cutoff = before.date()
        else:
            cutoff = before
        dropped: list[str] = []
        for name in sorted(os.listdir(self.path)):
            if not name.startswith("event_date="):
                continue
            try:
                day = datetime.date.fromisoformat(name.split("=", 1)[1])
            except ValueError:
                continue
            if day < cutoff:
                shutil.rmtree(os.path.join(self.path, name))
                dropped.append(name)
        return dropped


class TransactionalEventStore(EventStore):
    """EventStore whose write path is governed by the Delta-lite
    ``CommitLog`` (VERDICT r4 #7): data files become visible only via
    an atomic single-file manifest commit, never by directory listing.

    Layout under ``path``::

        _commits-<version>.json        the manifest (put-if-absent CAS)
        data/epoch=<id>/<writer>-<u8>/ one parquet dir per WRITE ATTEMPT
                                       (the manifest records the winner;
                                       losers are vacuumable orphans)
        snapshots/v<version>-<u8>/     compaction outputs (same rule)

    Crash matrix (tests/test_commit_log.py):
      * die after data write, before commit  → rows invisible; epoch
        replay writes a fresh attempt dir and commits — converges, no
        dupes; the dead attempt is vacuumable;
      * two LIVE writers race the same epoch  → both write their own
        attempt dirs; exactly one manifest commit wins; the loser's
        data write cannot touch the winner's committed files;
      * die mid-manifest write               → previous manifest stays
        authoritative (torn ``.tmp`` ignored);
      * die between snapshot write and swap  → old file set still
        served; re-running compaction converges;
      * redeliver a committed epoch          → manifest no-op.
    """

    def __init__(self, spark: SparkSession, path: str):
        super().__init__(spark, path)
        from meepo_spark.cdc.commit_log import CommitLog

        self.commits = CommitLog(path)

    def _epoch_dir(self, epoch_id: int) -> str:
        """A fresh WRITER-UNIQUE attempt dir for this epoch:
        ``data/epoch=<id>/<writer>-<uuid8>`` (ADVICE r6 #1). The CAS
        fencing protects only the manifest — two live writers
        redelivering the same epoch both pass the ``committed()``
        pre-check and both write data, and with a SHARED target the
        loser's ``mode('overwrite')`` could delete the winner's files
        AFTER the winner's manifest commit, so a reader listing files
        from the committed manifest could scan a half-rewritten dir.
        Per-attempt dirs make that physically impossible: the manifest
        records the winning attempt's path, and a losing writer's data
        write never touches files a committed manifest points at. The
        loser's dir is an orphan — invisible to ``log()`` — reclaimed
        by :meth:`vacuum_orphans`."""
        token = re.sub(r"[^A-Za-z0-9_.-]", "_", self.commits.writer_id)
        return os.path.join(
            self.path,
            "data",
            f"epoch={epoch_id}",
            f"{token}-{uuid.uuid4().hex[:8]}",
        )

    def _snapshot_dir(self) -> str:
        """Snapshot dirs get the same per-attempt uniqueness as epoch
        dirs — two concurrent compactions racing toward the same next
        version must not write the same directory (the loser's
        overwrite would gut the winner's committed snapshot)."""
        return os.path.join(
            self.path,
            "snapshots",
            f"v{self.commits.version() + 1}-{uuid.uuid4().hex[:8]}",
        )

    # --- inherited raw-directory paths are OFF here --------------------
    # The base class's append/streaming_sink write event_date= dirs
    # straight under the root (invisible to the manifest — silent data
    # loss on read), and expire() lists the root for event_date= dirs it
    # will never find in the data/epoch=<id> layout (silent retention
    # no-op). Fail loudly instead of bypassing the commit protocol.
    def append(self, changes: DataFrame) -> None:
        raise NotImplementedError(
            "TransactionalEventStore: use append_epoch(df, epoch_id) — "
            "raw append() would bypass the commit manifest and its rows "
            "would never be visible to log()"
        )

    def streaming_sink(self, changes: DataFrame, checkpoint: str):
        raise NotImplementedError(
            "TransactionalEventStore: drive the stream through "
            "foreachBatch -> append_epoch(batch, epoch_id); the raw "
            "parquet sink bypasses the commit manifest"
        )

    def expire(self, before) -> list[str]:
        raise NotImplementedError(
            "TransactionalEventStore: directory-listing retention does "
            "not apply to the manifest layout; compact_txn() then drop "
            "pre-snapshot epochs via the manifest instead"
        )

    # --- write path ---------------------------------------------------
    def append_epoch(self, changes: DataFrame, epoch_id: int) -> bool:
        """Idempotent transactional append: parquet lands in a fresh
        writer-unique attempt dir FIRST (a retry writes a NEW dir and
        orphans the old one — it never overwrites files a committed
        manifest might already point at), then one manifest commit
        makes it visible. Returns False when the epoch was already
        committed (redelivery) — whether we saw that in the pre-check
        or a rival won the same epoch while we were writing; either
        way the committed files are the record and our attempt dir is
        vacuumable garbage. Version races against rivals committing
        OTHER epochs are absorbed by the bounded retry loop."""
        if self.commits.committed(epoch_id):
            return False
        target = self._epoch_dir(epoch_id)
        (
            changes.withColumn("event_date", F.to_date("ts"))
            .write.mode("overwrite")
            .partitionBy("event_date")
            .parquet(target)
        )
        self._assert_attempt_alive(target)
        return self.commits.commit_with_retry(epoch_id, [target])

    def _assert_attempt_alive(self, target: str) -> None:
        """Zombie-writer fence: a writer that stalls past the vacuum
        grace window can have its (uncommitted) attempt dir reclaimed;
        committing the vacuumed path would poison every subsequent
        ``log()`` with a manifest entry pointing at nothing. Re-check
        existence immediately before the manifest commit and fail
        LOUDLY — the caller replays the epoch through the normal path
        (a fresh attempt dir), which is exactly the crash-recovery
        contract. The residual vacuum-between-check-and-commit window
        is milliseconds and requires vacuum running with a grace
        smaller than a single commit round-trip — a configuration
        violation of the documented contract (grace_seconds must
        exceed the longest write attempt AND the longest reader).

        Local-FS assumption: this fence (like vacuum_orphans' shutil/
        mtime sweep) checks existence with os.path.isdir, which is
        only meaningful when the store root is a local path. On a
        URI-addressed root (s3://, hdfs://) it would always report
        the dir missing and veto every commit — route the check
        through the Hadoop FileSystem API alongside the write path
        before pointing the store at a remote root."""
        if not os.path.isdir(target):
            raise RuntimeError(
                f"attempt dir vanished before commit (vacuumed?): {target} "
                "— writer exceeded the vacuum grace window; replay the epoch"
            )

    # --- read path ----------------------------------------------------
    def log(self) -> DataFrame:
        """Committed rows only — the file list comes from the manifest,
        so orphan dirs from a crashed writer are invisible. Each
        committed dir is its own scan (multi-root partition discovery
        would conflict) unioned by name: predicate/partition pruning
        applies per scan, and compaction keeps the union width at
        1 + epochs-since-compaction, so the plan never grows without
        bound."""
        from functools import reduce

        dirs = self.commits.files()
        if not dirs:
            return self.spark.createDataFrame([], LOG_SCHEMA)
        # Explicit schema, never inference: a committed EMPTY epoch is a
        # legal manifest entry whose dir holds only _SUCCESS (partitionBy
        # on zero rows emits no part files) — schema inference would
        # raise "Unable to infer schema" there and poison every read of
        # the store. With the schema pinned, an empty dir is just an
        # empty scan.
        scans = [
            self.spark.read.schema(LOG_SCHEMA)
            .parquet(d)
            .select(*[f.name for f in LOG_SCHEMA.fields])
            for d in dirs
        ]
        return reduce(lambda a, b: a.unionByName(b), scans)

    # --- maintenance --------------------------------------------------
    def compact_txn(self) -> DataFrame:
        """Compaction with an atomic manifest swap: write the latest
        image per (table, pk) to a NEW snapshot dir, then replace the
        live file set in one manifest version. Late redeliveries of
        pre-compaction epochs stay no-ops (epoch ids are retained)."""
        snap_dir = self._snapshot_dir()
        latest = (
            self.log()
            .groupBy("schema_name", "table", "pk")
            .agg(
                F.max_by(
                    F.struct("action", "row", "old_row", "ts", "offset", "txn_id"),
                    F.struct("ts", "offset"),
                ).alias("last")
            )
            .select(
                F.col("last.action").alias("action"),
                F.col("last.row").alias("row"),
                F.col("last.old_row").alias("old_row"),
                F.col("last.ts").alias("ts"),
                F.col("last.offset").alias("offset"),
                F.col("last.txn_id").alias("txn_id"),
                "schema_name",
                "table",
                "pk",
            )
            .filter(F.col("action") != "delete")
            .withColumn("event_date", F.to_date("ts"))
            .select(*[f.name for f in LOG_SCHEMA.fields])
        )
        latest.write.mode("overwrite").partitionBy("event_date").parquet(snap_dir)
        self.commits.compact([snap_dir], {"snapshot": snap_dir})
        return self.log()

    def vacuum_orphans(self, grace_seconds: float = 86400.0) -> list[str]:
        """Reclaim attempt dirs no live manifest references: losing
        same-epoch writers, crashed pre-commit writers, and
        pre-compaction epoch dirs the snapshot replaced. Only dirs
        whose NEWEST file is older than ``grace_seconds`` go — an
        in-flight writer that finished its parquet but has not yet
        won its manifest commit has fresh mtimes and survives (the
        Delta VACUUM retention discipline, filesystem-mtime flavored).
        Returns the removed paths.

        Grace-window CONTRACT (tests/test_commit_log.py concurrency
        matrix): ``grace_seconds`` must exceed BOTH (a) the longest
        write attempt — a writer that stalls past it can have its
        uncommitted dir reclaimed, and its late commit then fails
        loudly via ``_assert_attempt_alive`` (replay the epoch) — and
        (b) the longest-running reader — a reader iterating a
        pre-compaction manifest still scans the replaced epoch dirs,
        which become vacuum candidates the moment compaction swaps
        the file set; inside the grace window its scan is safe, past
        it the read fails (never silently loses rows — parquet scans
        of removed paths raise)."""
        import shutil
        import time

        live = {os.path.normpath(f) for f in self.commits.files()}
        now = time.time()
        candidates: list[str] = []
        data_root = os.path.join(self.path, "data")
        if os.path.isdir(data_root):
            for e in sorted(os.listdir(data_root)):
                ed = os.path.join(data_root, e)
                if e.startswith("epoch=") and os.path.isdir(ed):
                    candidates.extend(
                        os.path.join(ed, a) for a in sorted(os.listdir(ed))
                    )
        snap_root = os.path.join(self.path, "snapshots")
        if os.path.isdir(snap_root):
            candidates.extend(
                os.path.join(snap_root, s) for s in sorted(os.listdir(snap_root))
            )
        dropped: list[str] = []
        for d in candidates:
            dn = os.path.normpath(d)
            # self OR parent live: pre-round-7 (legacy layout) manifests
            # record data/epoch=<id> itself, whose CHILDREN here are its
            # committed event_date= partition dirs — deleting them would
            # silently empty a committed epoch (code-review r7 #1)
            if dn in live or os.path.dirname(dn) in live or not os.path.isdir(d):
                continue
            newest = max(
                (
                    os.path.getmtime(os.path.join(r, f))
                    for r, _dirs, fs in os.walk(d)
                    for f in fs
                ),
                default=os.path.getmtime(d),
            )
            if now - newest < grace_seconds:
                continue
            shutil.rmtree(d)
            dropped.append(d)
        if os.path.isdir(data_root):  # clear now-empty epoch= parents
            for e in sorted(os.listdir(data_root)):
                ed = os.path.join(data_root, e)
                if (
                    e.startswith("epoch=")
                    and os.path.normpath(ed) not in live  # legacy layout
                    and os.path.isdir(ed)
                    and not os.listdir(ed)
                ):
                    try:
                        os.rmdir(ed)
                    except OSError:
                        pass  # a live writer created a new attempt dir
                        # between the emptiness check and the rmdir
                        # (code-review r7 #2) — leave it for next time
        return dropped

class TypedTransactionalEventStore(TransactionalEventStore):
    """TransactionalEventStore whose epochs PERSIST the typed payload
    lane (VERDICT r5 #4): each committed epoch carries ``row_t`` (the
    registry-promoted STRUCT) and ``registry_version`` alongside the
    canonical ChangeEvent columns, so downstream queries read typed,
    prunable, min/max-indexed columns instead of re-parsing the string
    MAP on every scan — a24 proved the lanes equivalent in-query; this
    makes the typed lane the stored artifact.

    Drift contract (a16's unionByName discipline, persisted): the
    registry (schemas.PAYLOAD_REGISTRY) is ADDITIVE — version N+1 only
    appends struct fields — and each epoch's manifest entry records the
    registry_version it was written under, so ``typed_log`` can pin
    that exact schema per scan (never inference — the empty-epoch
    poison, code-review r5 #1) and re-merge mixed-version epochs with
    ``unionByName(allowMissingColumns=True)``: old epochs null-fill
    the new nested fields BY NAME, never positionally.

    Compaction keeps the lane: the snapshot is written from the merged
    typed log, whose row_t is already the max-version superset struct,
    and the compaction manifest records that version."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        registry: dict[int, T.StructType] | None = None,
    ):
        super().__init__(spark, path)
        from meepo_spark.schemas import PAYLOAD_REGISTRY

        self.registry = dict(registry or PAYLOAD_REGISTRY)

    def typed_schema(self, version: int) -> T.StructType:
        return T.StructType(
            list(LOG_SCHEMA.fields)
            + [
                T.StructField("row_t", self.registry[version]),
                T.StructField("registry_version", T.LongType()),
            ]
        )

    def append_epoch(
        self, changes: DataFrame, epoch_id: int, registry_version: int | None = None
    ) -> bool:
        """Promote + persist: ``row`` -> ``row_t`` under the given (or
        newest) registry version, stamp the version column, write the
        epoch parquet, record the version in the manifest entry. Same
        idempotence as the base: a redelivered epoch is a no-op even if
        the producer has since upgraded its registry version (the
        original epoch's lane is the record)."""
        from meepo_spark.cdc.events import typed_changes

        version = max(self.registry) if registry_version is None else registry_version
        if self.commits.committed(epoch_id):
            return False
        target = self._epoch_dir(epoch_id)
        (
            typed_changes(changes, self.registry[version])
            .withColumn("registry_version", F.lit(version).cast("long"))
            .withColumn("event_date", F.to_date("ts"))
            .write.mode("overwrite")
            .partitionBy("event_date")
            .parquet(target)
        )
        self._assert_attempt_alive(target)
        return self.commits.commit_with_retry(
            epoch_id, [target], {"registry_version": version}
        )

    def _file_versions(self) -> list[tuple[str, int]]:
        """(dir, registry_version) for every live manifest file, in
        manifest order. Compaction snapshots record their version in
        the compaction meta; epoch entries in their own meta."""
        state = self.commits._read()
        epoch_version = {}
        for meta in state["epochs"].values():
            v = meta.get("registry_version")
            if v is not None:
                for f in meta.get("files", []):
                    epoch_version[f] = v
        # the compaction version applies ONLY to the snapshot dir it
        # recorded — a blanket fallback would silently scan an epoch
        # committed by the UNTYPED store (post-compaction) under the
        # typed schema, null-filling row_t instead of raising the
        # loud contract error below (code-review r6 #1)
        comp = state.get("compaction", {})
        if comp.get("registry_version") is not None and comp.get("snapshot"):
            epoch_version.setdefault(comp["snapshot"], comp["registry_version"])
        out = []
        for d in state["files"]:
            v = epoch_version.get(d)
            if v is None:
                raise ValueError(
                    f"manifest file {d!r} has no registry_version — written "
                    "by the untyped store? read it via log() instead"
                )
            out.append((d, v))
        return out

    def typed_log(self) -> DataFrame:
        """Committed rows with the PERSISTED typed lane. Each dir scans
        under the exact schema of the version it was written with
        (pinned, never inferred), then mixed versions re-merge by name
        — the superset struct of the newest version involved, old
        epochs null-filled."""
        from functools import reduce

        fv = self._file_versions()
        if not fv:
            return self.spark.createDataFrame([], self.typed_schema(max(self.registry)))
        scans = [
            self.spark.read.schema(self.typed_schema(v))
            .parquet(d)
            .select(*[f.name for f in self.typed_schema(v).fields])
            for d, v in fv
        ]
        return reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), scans
        )

    def _latest_typed(self) -> tuple[DataFrame, int]:
        """Latest non-delete image per (table, pk) KEEPING row_t —
        written as the max-version superset struct the merged typed
        log already carries. Shared by both compaction layouts."""
        fv = self._file_versions()
        snap_version = max((v for _, v in fv), default=max(self.registry))
        cols = [f.name for f in self.typed_schema(snap_version).fields]
        payload = [c for c in cols if c != "event_date"]
        latest = (
            self.typed_log()
            .groupBy("schema_name", "table", "pk")
            .agg(
                F.max_by(
                    F.struct(*[c for c in payload if c not in ("schema_name", "table", "pk")]),
                    F.struct("ts", "offset"),
                ).alias("last")
            )
            .select(
                "schema_name",
                "table",
                "pk",
                *[
                    F.col(f"last.{c}").alias(c)
                    for c in payload
                    if c not in ("schema_name", "table", "pk")
                ],
            )
            .filter(F.col("action") != "delete")
            .withColumn("event_date", F.to_date("ts"))
            .select(*cols)
        )
        return latest, snap_version

    def compact_txn(self) -> DataFrame:
        """Typed compaction: latest non-delete image per (table, pk)
        KEEPING row_t, and the snapshot's manifest records the version
        so typed_log keeps working after the swap."""
        latest, snap_version = self._latest_typed()
        snap_dir = self._snapshot_dir()
        latest.write.mode("overwrite").partitionBy("event_date").parquet(snap_dir)
        self.commits.compact(
            [snap_dir], {"snapshot": snap_dir, "registry_version": snap_version}
        )
        return self.typed_log()

    def compact_txn_clustered(
        self, target_bytes: int = 256 * 1024 * 1024
    ) -> tuple[str, int]:
        """File-grain OPTIMIZE of the typed snapshot (VERDICT r9 task
        6): the same latest-image merge as `compact_txn`, laid out as
        ceil(live_bytes / target_bytes) parquet files Morton-ordered
        on (table, pk) — each output file covers a small rectangle of
        the (table-rank, pk) space, so the two hot replay access
        patterns — "rebuild table X" (table equality) and "point/range
        look-up of a pk" — both skip files on footer min/max stats,
        and file sizes land at the OPTIMIZE sweet spot regardless of
        how fragmented the epochs were. Returns (snapshot_dir,
        n_files).

        Layout keys: the table rank is a DENSE driver-side enumeration
        (CDC table sets are small and known — the manifest is already
        driver state); the pk lane prefers the numeric value
        (try_cast, min/max-bucketed → range predicates prune) and
        falls back to a hash bucket for non-numeric pks (equality
        still prunes). The numeric pk is PERSISTED as `pk_num` so
        readers filter the exact column the layout clustered —
        consistent with lakehouse OPTIMIZE materializing its
        clustering key. typed_log reads under the pinned schema and
        simply ignores the extra column.

        At 100 TB: one bounds aggregate (1 row) + one range-partitioned
        sort shuffle — the shuffle a compaction rewrite was paying
        anyway; byte sizing comes from the manifest's live files, not
        a count heuristic."""
        import math
        import os

        from meepo_spark.operators.layout import ZBITS, _bucket, clustered_write

        latest, snap_version = self._latest_typed()
        live = self.commits._read()["files"]
        live_bytes = sum(
            os.path.getsize(os.path.join(root, f))
            for d in live
            for root, _, fs in os.walk(d)
            for f in fs
            if f.endswith(".parquet")
        )
        # compaction dedups to latest images — scale the byte estimate
        # by the survivor ratio (two count aggs; compaction is a rare
        # maintenance job) so files land near target even when the log
        # is mostly superseded versions
        log_rows = self.typed_log().count()
        latest_rows = latest.count()
        est = live_bytes * latest_rows / max(log_rows, 1)
        n_files = max(1, math.ceil(est / target_bytes))
        tables = sorted(
            r[0] for r in latest.select("table").distinct().collect()
        )  # bounded driver state: the CDC table set
        # dense rank SCALED across the full bucket range — a raw 0..k
        # rank only occupies log2(k) LOW bits, so the Morton key would
        # be pk-dominated and table predicates would never skip files;
        # spreading the k ranks over [0, 2^ZBITS) gives the table dim
        # high interleave bits too (k never exceeds the 256 buckets in
        # practice; beyond that ranks share buckets, degrading pruning
        # for the colliding tables only, never correctness)
        t_rank = F.lit(0)
        for i, t in enumerate(tables):
            scaled = (2 * i + 1) * (2**ZBITS) // (2 * len(tables))
            t_rank = F.when(F.col("table") == t, F.lit(scaled)).otherwise(t_rank)
        pk_num = F.col("pk").try_cast("long")
        with_pk = latest.withColumn(
            "pk_num",
            F.coalesce(pk_num, F.pmod(F.xxhash64("pk"), F.lit(2**ZBITS)).cast("long")),
        )
        lo, hi = with_pk.agg(F.min("pk_num"), F.max("pk_num")).first()
        if lo is None:  # empty store: degenerate but valid layout
            lo, hi = 0, 1
        snap_dir = self._snapshot_dir()
        # table rank rides the SECOND interleave lane (whose bit i
        # lands at position 2i+1 — including the TOP bit), so the file
        # order is table-major: "rebuild table X" — the dominant
        # replay pattern — skips on the very first split, while pk
        # ranges still prune on the alternating bits
        n_out = clustered_write(
            with_pk,
            _bucket(F.col("pk_num"), F.lit(lo), F.lit(hi)),
            t_rank,
            snap_dir,
            n_files,
        )
        self.commits.compact(
            [snap_dir],
            {
                "snapshot": snap_dir,
                "registry_version": snap_version,
                "layout": {
                    "zorder": ["table", "pk_num"],
                    "files": n_out,
                    "target_bytes": target_bytes,
                },
            },
        )
        return snap_dir, n_out
