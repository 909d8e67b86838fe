"""Custom Python DataSource (PySpark 4 `pyspark.sql.datasource` API):
a change-log connector.

The reference ingests change feeds from systems Spark has no native
reader for (a binlog stream fanned out over blinker signals / Redis).
This is the Spark-4-idiomatic adapter seam for that: a DataSource
subclass registered once per session, after which the feed is a
first-class `spark.read.format("meepo_changelog")` table — usable in
joins, aggregations, and the CDC layer like any parquet scan.

The demo feed here is the events fixture read through pyarrow —
standing in for "a log only a Python client library can read". The
engineering points are real regardless of the backing system:

* **partition-parallel**: one InputPartition per parquet row group,
  so a 1000-executor cluster splits the log without coordination
  (a real binlog connector would partition by offset range);
* **Arrow batches, not rows**: `read()` yields pyarrow RecordBatches
  — the vectorized path through the Python worker, not per-row
  pickling;
* **schema discipline**: timestamps are cast ns→µs inside the
  connector, because parquet's ns precision would otherwise drift
  against Spark's µs TimestampType (same trap as the DuckDB oracle).

A Python DataSource still pays one Python-worker hop per partition;
it is the EXTENSIBILITY seam, not the bulk path — bulk formats
(parquet/orc/csv/json) stay on the JVM-native readers.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

EVENTS_DDL = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)
EVENTS_COLUMNS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def arrow_schema():
    import pyarrow as pa

    return pa.schema(
        [
            pa.field("event_id", pa.int64()),
            pa.field("ts", pa.timestamp("us")),
            pa.field("user_id", pa.int64()),
            pa.field("event_type", pa.string()),
            pa.field("value", pa.float64()),
            pa.field("props", pa.string()),
        ]
    )


class RowGroupPartition(InputPartition):
    def __init__(self, path: str, index: int):
        self.path = path
        self.index = index


class ChangeLogReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]

    def partitions(self):
        import pyarrow.parquet as pq

        n = pq.ParquetFile(self.path).metadata.num_row_groups
        return [RowGroupPartition(self.path, i) for i in range(max(n, 1))]

    def read(self, partition):
        import pyarrow.parquet as pq

        tbl = pq.ParquetFile(partition.path).read_row_group(partition.index)
        # safe=False permits the ns→µs truncation (the fixture carries
        # sub-µs precision); Spark's native parquet reader truncates
        # identically, so round-trip parity holds to the microsecond
        yield from (
            tbl.select(EVENTS_COLUMNS).cast(arrow_schema(), safe=False).to_batches()
        )


class ChangeLogStreamReader(SimpleDataSourceStreamReader):
    """Offset-tailing streaming reader — the actual shape of a binlog
    connector: the offset (here a row position; in production a binlog
    file+position or GTID) is the ONLY state, checkpointed by Spark,
    so recovery replays `readBetweenOffsets` deterministically and the
    downstream exactly-once foreachBatch MERGE (cdc/exactly_once.py)
    sees each change exactly once. `maxRowsPerBatch` caps micro-batch
    size the way `maxOffsetsPerTrigger` does for Kafka."""

    def __init__(self, options):
        self.path = options["path"]
        self.batch_rows = int(options.get("maxRowsPerBatch", "5000"))
        self._n_rows: int | None = None

    def _total_rows(self) -> int:
        if self._n_rows is None:
            import pyarrow.parquet as pq

            self._n_rows = pq.ParquetFile(self.path).metadata.num_rows
        return self._n_rows

    def _slice(self, start_row: int, end_row: int):
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = (
            pq.read_table(self.path, columns=EVENTS_COLUMNS)
            .slice(start_row, end_row - start_row)
            .cast(arrow_schema(), safe=False)
        )
        cols = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
        return iter(zip(*cols)) if cols else iter([])

    def initialOffset(self) -> dict:
        return {"row": 0}

    def read(self, start: dict):
        s = start["row"]
        e = min(s + self.batch_rows, self._total_rows())
        if e <= s:
            return iter([]), start
        return self._slice(s, e), {"row": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._slice(start["row"], end["row"])


class ChangeLogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "meepo_changelog"

    def schema(self) -> str:
        return EVENTS_DDL

    def reader(self, schema):
        return ChangeLogReader(self.options)

    def simpleStreamReader(self, schema):
        return ChangeLogStreamReader(self.options)


def register_changelog_source(spark) -> None:
    """Idempotently register the connector on this session."""
    try:
        spark.dataSource.register(ChangeLogDataSource)
    except Exception:
        pass  # already registered on this session


# ---- custom streaming SINK (publisher parity) ----------------------


class _StagedFiles(WriterCommitMessage):
    def __init__(self, files):
        self.files = files


class BroadcastStreamWriter(DataSourceStreamWriter):
    """Staged-commit publisher sink — the write-side twin of the
    changelog reader, standing in for a zmq/kafka broadcast publisher.
    Exactly-once discipline without any sink-side transaction support:

    * `write()` (executors, one per partition) stages the partition's
      payloads under `_staging/` with a task-unique name and returns
      the staged paths as its commit message — nothing is visible yet;
    * `commit()` (driver, once per micro-batch, only after EVERY task
      succeeded) atomically renames staged files into the output dir
      and records `_commits/<batchId>`; a replayed batch whose marker
      already exists is skipped wholesale — the file-rename analogue
      of the MERGE-on-txn_id idempotence in cdc/exactly_once.py;
    * `abort()` discards the staged files, so failed batches leave no
      partial output.
    """

    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        import os
        import uuid

        from pyspark import TaskContext

        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        pid = TaskContext.get().partitionId()
        name = os.path.join(staging, f"part-{pid}-{uuid.uuid4().hex}.txt")
        n = 0
        with open(name + ".tmp", "w") as f:
            for row in iterator:
                f.write(row[0] + "\n")
                n += 1
        if n:
            os.rename(name + ".tmp", name)
            return _StagedFiles([name])
        os.remove(name + ".tmp")
        return _StagedFiles([])

    def commit(self, messages, batchId):
        import os

        commits = os.path.join(self.path, "_commits")
        os.makedirs(commits, exist_ok=True)
        marker = os.path.join(commits, str(batchId))
        staged = [f for m in messages if m is not None for f in m.files]
        if os.path.exists(marker):  # replayed batch: drop re-staged output
            for f in staged:
                os.remove(f)
            return
        for f in staged:
            os.rename(f, os.path.join(self.path, os.path.basename(f)))
        with open(marker, "w") as fh:
            fh.write(f"{len(staged)}\n")

    def abort(self, messages, batchId):
        import os

        for m in messages:
            if m is not None:
                for f in m.files:
                    if os.path.exists(f):
                        os.remove(f)


class BroadcastSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "meepo_broadcast"

    def schema(self) -> str:
        return "value string"

    def streamWriter(self, schema, overwrite):
        return BroadcastStreamWriter(self.options)


def register_broadcast_sink(spark) -> None:
    """Idempotently register the publisher sink on this session."""
    try:
        spark.dataSource.register(BroadcastSinkDataSource)
    except Exception:
        pass  # already registered on this session
