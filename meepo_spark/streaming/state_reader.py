"""Offline streaming-state introspection (Spark 4 ``statestore`` /
``state-metadata`` readers) — the observability half of the stateful
streaming story (SURVEY.md §2.B T6).

A production stateful pipeline at 100 TB accumulates state you cannot
see from the query itself: per-key running aggregates, dedup
watermark sets, session windows in flight. The Spark 4 state readers
expose every checkpointed state store as a BATCH DataFrame, which
turns three operational jobs into plain queries:

- **state growth audits** — count/size state rows per operator and
  partition before they OOM an executor (the reader is partitioned
  like the store itself, so the audit scales with the cluster);
- **stuck-pipeline debugging** — inspect exactly which keys a
  watermark is holding back, offline, without stopping the stream;
- **state time travel** — ``batch_id`` pins the store as of any
  retained checkpoint batch, so a bad deploy's state can be diffed
  against the batch before it (the same manifest-pinned-snapshot
  discipline as cdc/commit_log, applied to stream state).

Wrappers stay thin on purpose: the readers ARE the public Spark API;
what this module adds is the flattened output shape (state structs
unpacked to columns) and the option plumbing tests can pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Operator/store inventory of a checkpoint: one row per state
    store with its operator name, partition count, and the retained
    [minBatchId, maxBatchId] window ``read_state(batch_id=...)`` may
    time-travel to."""
    return spark.read.format("state-metadata").load(checkpoint)


def read_state(
    spark: SparkSession,
    checkpoint: str,
    *,
    operator_id: int = 0,
    batch_id: int | None = None,
    flatten: bool = True,
) -> DataFrame:
    """The keyed state of one stateful operator as a batch DataFrame.

    ``batch_id=None`` reads the latest committed batch; an explicit id
    pins the store as of that batch (bounded below by the checkpoint's
    retention — see ``read_state_metadata``). With ``flatten`` the
    ``key``/``value`` structs are unpacked into their fields (name
    collisions keep the struct prefix via the aliased select), which
    is the shape audits join against the live tables.
    """
    reader = (
        spark.read.format("statestore")
        .option("operatorId", operator_id)
    )
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    df = reader.load(checkpoint)
    if not flatten:
        return df
    return df.select("key.*", "value.*", "partition_id")
