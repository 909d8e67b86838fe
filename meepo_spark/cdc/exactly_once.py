"""Exactly-once delivery and the prepare/commit envelope — meepo's
RedisPrepareCommit protocol re-expressed as sink discipline
(ref: meepo/apps/eventsourcing/prepare_commit.py, module path per
SURVEY.md §0; design per SURVEY.md §4.3#1).

Spark gives at-least-once into arbitrary sinks; exactly-once = replay
idempotence. Two cooperating pieces:

  * ``idempotent_foreach_batch`` — a foreachBatch wrapper that skips
    epochs it has already committed (epoch ledger beside the sink) and
    dedups rows within the batch by (txn_id, pk, offset). A retried or
    replayed micro-batch lands zero new rows.
  * ``in_doubt`` — sessions prepared but never committed/rolled back
    (meepo's "phantom" sessions): one left-anti join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meepo_spark.operators.broadcast_gate import maybe_broadcast


class EpochLedger:
    """Atomic batch-id ledger, backed by the Delta-lite single-file
    CommitLog (VERDICT r4 #7 — previously a file-per-epoch marker
    directory). In production this is the transactional sink's own
    commit table (Delta txn log, JDBC upsert keyed by epoch); the
    contract is just 'committed(epoch) is durable and atomic', which
    the manifest's os.replace swap provides — plus torn-write safety
    the marker files never had."""

    def __init__(self, path: str):
        from meepo_spark.cdc.commit_log import CommitLog

        self.path = path
        self._log = CommitLog(path)

    def committed(self, epoch_id: int) -> bool:
        return self._log.committed(epoch_id)

    def commit(self, epoch_id: int, meta: dict | None = None) -> None:
        self._log.commit(epoch_id, [], meta)


def idempotent_foreach_batch(ledger: EpochLedger, write_fn):
    """Wrap a foreachBatch body so redelivered epochs are no-ops and
    in-batch duplicates collapse on the event identity key."""

    def body(batch_df: DataFrame, epoch_id: int) -> None:
        if ledger.committed(epoch_id):
            return
        # persist() so the dedup (a shuffle over the micro-batch) runs
        # ONCE per epoch: write_fn materializes the cache, the ledger
        # row count reads it back — not a second full recompute. A
        # write_fn that already knows its row count may return it and
        # skip the count() action entirely.
        deduped = batch_df.dropDuplicates(["txn_id", "pk", "offset"]).persist()
        try:
            written = write_fn(deduped, epoch_id)
            # bool subclasses int: a write_fn returning a True/False
            # success flag must not be recorded as rows=1/0.
            rows = (
                written
                if isinstance(written, int) and not isinstance(written, bool)
                else deduped.count()
            )
            ledger.commit(epoch_id, {"rows": rows})
        finally:
            deduped.unpersist()

    return body


def in_doubt(prepared: DataFrame, committed: DataFrame, rolled_back: DataFrame | None = None) -> DataFrame:
    """Prepared-but-unresolved transactions (meepo's phantom-session
    scan): prepared ⟕̸ committed ⟕̸ rolled_back on txn_id."""
    out = prepared.join(committed, "txn_id", "left_anti")
    if rolled_back is not None:
        out = out.join(rolled_back, "txn_id", "left_anti")
    return out


def deliverable(
    changes: DataFrame,
    committed: DataFrame,
    generation: object | None = None,
) -> DataFrame:
    """Gate event delivery on the commit record (sqlalchemy_es_pub
    semantics: events buffered at prepare are only published after
    session_commit). One semi join whose commit-record side is
    size-gated: per-batch commit sets broadcast, but an ever-growing
    commit HISTORY (data-growing) falls back to a shuffled semi join
    instead of riding a static hint into a driver OOM (VERDICT r5 #1).
    A long-running driver passing the SAME growing history frame each
    batch should pass its batch/epoch id as ``generation`` so the gate
    re-probes per epoch instead of pinning the first batch's verdict
    (ADVICE r6 #2); even without it, under-bound verdicts self-expire
    on the gate's hit-count cadence. Streaming frames can't be probed
    (no actions on unstarted streams) — they stay unhinted and let the
    planner decide."""
    side = committed.select("txn_id")
    if not side.isStreaming:
        side = maybe_broadcast(side, generation=generation)
    return changes.join(side, "txn_id", "left_semi")
