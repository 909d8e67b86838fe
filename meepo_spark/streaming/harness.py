"""Batch-equivalence harness (SURVEY.md §5.2.3) — the streaming analog
of the DuckDB oracle: replay a fixture as ordered file chunks, run the
streaming query to completion with availableNow, and compare against
the same computation on the batch DataFrame.
"""

from __future__ import annotations

import datetime
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from meepo_spark.schemas import EVENTS


FLUSH_EVENT_TYPE = "__flush__"
FLUSH_USER_ID = -1


def _pin_arrival_order(out_dir: str, seen: set[str], order: int) -> None:
    """FileStreamSource batches same-source files by MODIFICATION TIME,
    and same-mtime ties fall back to listing order over random UUID
    part names — which would scramble chunk arrival and void the
    replay's ordering/disorder contract (ADVICE r9 #5). Pin every file
    the chunk just wrote to a strictly increasing mtime so arrival
    order is explicit, not an accident of write latency."""
    base = int(time.time())
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if name not in seen and os.path.isfile(p):
            os.utime(p, (base + order, base + order))
            seen.add(name)


def replay_as_files(
    df: DataFrame,
    out_dir: str,
    n_chunks: int = 5,
    order_col: str = "ts",
    flush: bool = True,
) -> str:
    """Write ``df`` as ``n_chunks`` parquet files in event-time order —
    a deterministic file-by-file arrival simulation.

    ``flush`` appends one sentinel event 30 days past the max ts as a
    final chunk: in append mode a window only emits once the watermark
    passes its end, so without the sentinel the last windows would
    stay open forever when the availableNow stream ends. Tests filter
    the sentinel (FLUSH_EVENT_TYPE / FLUSH_USER_ID) from results.
    """
    chunked = df.withColumn("__chunk", F.ntile(n_chunks).over(W.orderBy(order_col)))
    seen: set[str] = set()
    for i in range(1, n_chunks + 1):
        (
            chunked.filter(F.col("__chunk") == i)
            .drop("__chunk")
            .coalesce(1)
            .write.mode("append")
            .parquet(out_dir)
        )
        _pin_arrival_order(out_dir, seen, i)
    if flush:
        flush_ts = df.agg(F.max(order_col)).first()[0] + datetime.timedelta(days=30)
        sentinel = _one_row_df(
            df.sparkSession,
            (-1, flush_ts, FLUSH_USER_ID, FLUSH_EVENT_TYPE, 0.0, "{}"),
            df.schema,
        )
        sentinel.write.mode("append").parquet(out_dir)
        _pin_arrival_order(out_dir, seen, n_chunks + 1)
    return out_dir


def _one_row_df(spark: SparkSession, row: tuple, schema) -> DataFrame:
    """One-row single-partition local frame. NOT
    createDataFrame(...).coalesce(1): a parallelized local relation
    gets defaultParallelism slices and coalescing them costs ~150 ms
    PER PARENT SLICE per action (~4.7 s at local[32] — measured,
    optimization r11); parallelize(..., 1) skips the pathology."""
    return spark.createDataFrame(spark.sparkContext.parallelize([row], 1), schema)


def drop_flush(df: DataFrame) -> DataFrame:
    """Remove sentinel-derived rows from a windowed result (matches on
    any of the columns a query may carry through)."""
    cols = set(df.columns)
    if "event_type" in cols:
        df = df.filter(F.col("event_type") != FLUSH_EVENT_TYPE)
    if "user_id" in cols:
        df = df.filter(F.col("user_id") != FLUSH_USER_ID)
    return df


def run_streaming(
    spark: SparkSession,
    src_dir: str,
    transform,
    checkpoint: str,
    schema=EVENTS,
    output_mode: str = "append",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Run ``transform(stream_df)`` over the file source to completion
    (availableNow, one file per micro-batch => watermark advances
    between batches) and return the materialized result."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    name = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    # A stateful operator holding a PROCESSING-TIME timer keeps an
    # availableNow query alive after every file is committed: it spins
    # "no new data but cleaning up state" micro-batches back-to-back
    # waiting for wall-clock timers (the t6 sessionizer's 60 s
    # tail-session timer — measured as a full 300 s awaitTermination
    # timeout per test run, optimization r11). Watermark queries
    # legitimately need one or two such wrap-up batches (the final
    # append-mode emission happens when the watermark advances past
    # the flush sentinel) and then terminate on their own; only a
    # timer-holding query LOOPS them. Detect the loop — many
    # consecutive zero-input batches with no data available — and
    # stop: every file is committed by then, so the sink holds the
    # complete data-driven output (tests of the timer path assert
    # prefix-consistency, not tail-session emission).
    deadline = time.time() + 300
    cleanup_batches = 0
    last_bid = -1
    while q.isActive and time.time() < deadline:
        st = q.status
        lp = q.lastProgress
        if not st["isDataAvailable"] and lp is not None:
            bid, n_in = lp["batchId"], lp["numInputRows"]
            if bid != last_bid and n_in == 0:
                cleanup_batches += 1
                if cleanup_batches >= 8:
                    break
            last_bid = bid
        else:
            cleanup_batches = 0
        time.sleep(0.25)
    if q.isActive:
        q.stop()
    q.awaitTermination(60)
    return spark.table(name)


def assert_batch_equivalent(
    spark: SparkSession, batch_df: DataFrame, streamed: DataFrame, keys: list[str]
) -> None:
    """Order-insensitive equality between the streaming result and the
    batch computation."""
    b = sorted(map(tuple, batch_df.select(*keys).collect()))
    s = sorted(map(tuple, streamed.select(*keys).collect()))
    assert b == s, f"batch {len(b)} rows vs stream {len(s)} rows;\nbatch[:3]={b[:3]}\nstream[:3]={s[:3]}"


def replay_with_bounded_disorder(
    df: DataFrame,
    out_dir: str,
    late_every_other_s: int,
    n_chunks: int = 24,
) -> str:
    """Replay with a KNOWN disorder bound δ (VERDICT r8 #4): odd
    event_ids arrive as if their time were ts + δ seconds, so every
    row's lateness — max event time in any EARLIER-arriving chunk
    minus its own ts — is ≤ δ by construction (earlier chunks hold
    only rows with arrival key ≤ this row's ts + δ, and arrival key
    ≥ ts). Chunks are cut on arrival order (ntile, event_id
    tiebreak), written in order, and closed with the standard flush
    sentinel 30 days past the maximum arrival key so every window
    eventually emits under availableNow. The matching batch-side
    census (tests/test_streaming.py) recomputes the identical chunk
    assignment, so the per-batch watermark is a closed-form function
    of the fixture — that is what makes exact loss accounting
    possible."""
    arr = df.withColumn(
        "__arr",
        F.col("ts")
        + F.make_interval(
            secs=F.when(F.col("event_id") % 2 == 1, F.lit(late_every_other_s))
            .otherwise(F.lit(0))
            .cast("double")
        ),
    )
    chunked = arr.withColumn(
        "__chunk", F.ntile(n_chunks).over(W.orderBy("__arr", "event_id"))
    )
    seen: set[str] = set()
    for i in range(1, n_chunks + 1):
        (
            chunked.filter(F.col("__chunk") == i)
            .drop("__arr", "__chunk")
            .coalesce(1)
            .write.mode("append")
            .parquet(out_dir)
        )
        _pin_arrival_order(out_dir, seen, i)
    flush_ts = arr.agg(F.max("__arr")).first()[0] + datetime.timedelta(days=30)
    sentinel = _one_row_df(
        df.sparkSession,
        (-1, flush_ts, FLUSH_USER_ID, FLUSH_EVENT_TYPE, 0.0, "{}"),
        df.schema,
    )
    sentinel.write.mode("append").parquet(out_dir)
    _pin_arrival_order(out_dir, seen, n_chunks + 1)
    return out_dir
