"""Custom stateful per-key processing (T6) — applyInPandasWithState.

The shape meepo's replicator worker callbacks had (per-key handlers
with retry/queue state) becomes a keyed state machine: Spark owns
partitioning, state storage, and timeout scheduling; the handler is
pure Python over Arrow batches.

Example operator: per-user running session tracker that emits a row
per closed session (timeout-based), mirroring what the session_window
aggregate computes declaratively — used by tests to cross-check.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

SESSION_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("first_ts", T.TimestampType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("first_ms", T.LongType()),
        T.StructField("last_ms", T.LongType()),
    ]
)

GAP_MS = 30 * 60 * 1000


def _track(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    """Accumulate per-user event counts; close (emit) the session when
    the event-time gap exceeds GAP_MS within the observed data, or on
    processing-time timeout for the tail session."""
    (user_id,) = key
    rows = []
    if state.hasTimedOut:
        n, first_ms, last_ms = state.get
        rows.append((user_id, n, first_ms, last_ms))
        state.remove()
    else:
        ts_ms: list[int] = []
        for pdf in pdfs:
            ts_ms.extend(int(t.value // 1_000_000) for t in pd.to_datetime(pdf["ts"]))
        ts_ms.sort()
        if state.exists:
            n, first_ms, last_ms = state.get
        else:
            n, first_ms, last_ms = 0, None, None
        for t in ts_ms:
            if last_ms is not None and t - last_ms > GAP_MS:
                rows.append((user_id, n, first_ms, last_ms))
                n, first_ms = 0, None
            n += 1
            first_ms = t if first_ms is None else first_ms
            last_ms = t
        state.update((n, first_ms, last_ms))
        state.setTimeoutDuration(60_000)
    out = pd.DataFrame(rows, columns=["user_id", "n_events", "first_ms", "last_ms"])
    if not out.empty:
        out["first_ts"] = pd.to_datetime(out.pop("first_ms"), unit="ms")
        out["last_ts"] = pd.to_datetime(out.pop("last_ms"), unit="ms")
    else:
        out = pd.DataFrame(columns=["user_id", "n_events", "first_ts", "last_ts"])
    yield out


def session_tracker(events: DataFrame) -> DataFrame:
    """Keyed stateful sessionizer over a streaming events DataFrame."""
    return events.groupBy("user_id").applyInPandasWithState(
        _track,
        outputStructType=SESSION_OUT,
        stateStructType=STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---- transformWithState (Spark 4 API) ------------------------------

TOTALS_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _build_running_totals_processor():
    """The new-API twin of `_track`'s state machine: Spark 4's
    `transformWithState` replaces the (state-tuple, timeout-conf)
    calling convention with a StatefulProcessor object holding typed
    state handles (value/list/map + timers), backed by the RocksDB
    state store — the API all new stateful operators should target.
    Built lazily: the class is defined at call time so importing this
    module never requires a live session.

    Runtime requirement: the transformWithState driver worker talks
    protobuf to the JVM state server, so `google.protobuf` must be
    installed (pyspark's connect extra ships it). Where it isn't —
    this container — the operator raises at stream start and
    `session_tracker` (applyInPandasWithState) is the supported
    stateful path; tests importorskip accordingly."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "n BIGINT, total DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            prev = self._agg.get()
            n, total = (prev[0], prev[1]) if prev is not None else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._agg.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return RunningTotals()


def running_totals(events: DataFrame) -> DataFrame:
    """Per-user cumulative (count, value-sum) in Update mode — each
    micro-batch emits the key's refreshed totals, so the LAST row per
    key equals the batch aggregate after a full drain."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_build_running_totals_processor(),
        outputStructType=TOTALS_OUT,
        outputMode="Update",
        timeMode="None",
    )
