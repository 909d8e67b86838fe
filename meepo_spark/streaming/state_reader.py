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
from pyspark.sql import functions as F


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
    store_name: str | None = None,
    join_side: str | None = None,
    flatten: bool = True,
) -> DataFrame:
    """The keyed state of one stateful operator as a batch DataFrame.

    ``batch_id=None`` reads the latest committed batch; an explicit id
    pins the store as of that batch (bounded below by the checkpoint's
    retention — see ``read_state_metadata``). Multi-store operators
    need one of the selectors Spark's reader requires: ``store_name``
    (see the metadata's ``stateStoreName`` column) or, for
    stream-stream joins, ``join_side`` ('left' | 'right'). With
    ``flatten`` the ``key``/``value`` structs are unpacked into their
    fields; a field name appearing in BOTH structs (or shadowing
    ``partition_id``) keeps its struct prefix as ``key_<f>`` /
    ``value_<f>`` so the result is always joinable by name.
    """
    reader = (
        spark.read.format("statestore")
        .option("operatorId", operator_id)
    )
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    if join_side is not None:
        reader = reader.option("joinSide", join_side)
    df = reader.load(checkpoint)
    return _flatten_state(df) if flatten else df


def _flatten_state(df: DataFrame) -> DataFrame:
    """Unpack key/value structs to columns; a field present in BOTH
    structs (or shadowing partition_id) keeps its struct prefix. If
    the prefixing itself would still collide (a literal ``key_<f>`` /
    ``value_<f>`` field next to a clashing ``<f>``), fail loudly —
    an ambiguous frame would break the 'joinable by name' contract
    silently on first use; such schemas should use flatten=False."""
    key_fields = [f.name for f in df.schema["key"].dataType.fields]
    val_fields = [f.name for f in df.schema["value"].dataType.fields]
    clash = (set(key_fields) & set(val_fields)) | {"partition_id"}
    names = [f"key_{f}" if f in clash else f for f in key_fields]
    names += [f"value_{f}" if f in clash else f for f in val_fields]
    names.append("partition_id")
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        raise ValueError(
            f"state schema flattens ambiguously (duplicate columns "
            f"{sorted(dupes)}); read with flatten=False and unpack "
            "the key/value structs explicitly"
        )
    cols = [
        F.col(f"key.{f}").alias(f"key_{f}" if f in clash else f)
        for f in key_fields
    ]
    cols += [
        F.col(f"value.{f}").alias(f"value_{f}" if f in clash else f)
        for f in val_fields
    ]
    return df.select(*cols, "partition_id")
