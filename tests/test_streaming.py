"""Streaming T1-T7 tests: batch-equivalence on chunked replays
(SURVEY.md §5.2.3), watermark late-data semantics, streaming dedup,
stateful per-key processing, trigger modes."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from meepo_spark.catalog import table
from meepo_spark.streaming.harness import (
    assert_batch_equivalent,
    drop_flush,
    replay_as_files,
    run_streaming,
)
from meepo_spark.streaming.windows import session_agg, sliding_agg, tumbling_agg


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return table(spark, sf_dir, "events")


@pytest.fixture(scope="module")
def replay_dir(events, tmp_path_factory):
    out = tmp_path_factory.mktemp("replay")
    return replay_as_files(events, str(out / "files"), n_chunks=5)


def test_t2_tumbling_batch_equivalence(spark, events, replay_dir, tmp_path):
    streamed = run_streaming(
        spark,
        replay_dir,
        lambda s: tumbling_agg(s, size="1 day", watermark="1 minute"),
        str(tmp_path / "ck"),
    )
    batch = tumbling_agg(events, size="1 day")
    cols = ["w_start", "w_end", "event_type", "n", "total_value"]
    assert_batch_equivalent(spark, batch, drop_flush(streamed), cols)


def test_t3_sliding_batch_equivalence(spark, events, replay_dir, tmp_path):
    streamed = run_streaming(
        spark,
        replay_dir,
        lambda s: sliding_agg(s, size="2 days", slide="1 day", watermark="1 minute"),
        str(tmp_path / "ck"),
    )
    batch = sliding_agg(events, size="2 days", slide="1 day")
    assert_batch_equivalent(
        spark, batch, drop_flush(streamed), ["w_start", "w_end", "event_type", "n"]
    )


def test_t4_session_batch_equivalence(spark, events, replay_dir, tmp_path):
    streamed = run_streaming(
        spark,
        replay_dir,
        lambda s: session_agg(s, gap="30 minutes", watermark="1 minute"),
        str(tmp_path / "ck"),
    )
    batch = session_agg(events, gap="30 minutes")
    cols = ["user_id", "s_start", "s_end", "n_events", "session_value"]
    assert_batch_equivalent(spark, batch, drop_flush(streamed), cols)


def test_t1_t5_late_rows_cannot_reopen_emitted_windows(spark, tmp_path):
    """T5 late-data policy, the guaranteed direction: once the
    watermark has passed a window's end and the window emitted, a late
    row for that window is dropped — the sink never sees a duplicate
    or updated row for it. (A late row for a never-emitted window MAY
    still be aggregated in the same batch it arrives — Spark's drop is
    best-effort below the watermark, final-result safety is the
    contract.)"""
    import glob
    import os
    import time

    import pandas as pd

    from meepo_spark.schemas import EVENTS

    on_time = pd.DataFrame(
        {
            "event_id": [1, 2],
            "ts": pd.to_datetime(["2024-01-02 00:10:00", "2024-01-03 00:00:00"]),
            "user_id": [1, 1],
            "event_type": ["view", "view"],
            "value": [1.0, 1.0],
            "props": ["{}", "{}"],
        }
    )
    late = pd.DataFrame(
        {
            "event_id": [3],
            "ts": pd.to_datetime(["2024-01-02 00:20:00"]),  # same window as event 1
            "user_id": [1],
            "event_type": ["view"],
            "value": [1.0],
            "props": ["{}"],
        }
    )
    filler = pd.DataFrame(
        {
            "event_id": [4],
            "ts": pd.to_datetime(["2024-01-03 00:05:00"]),
            "user_id": [2],
            "event_type": ["view"],
            "value": [1.0],
            "props": ["{}"],
        }
    )
    src = str(tmp_path / "late_src")

    def write_chunk(pdf, age_s):
        before = set(glob.glob(f"{src}/*.parquet"))
        spark.createDataFrame(pdf, EVENTS).coalesce(1).write.mode("append").parquet(src)
        now = time.time()
        for f in set(glob.glob(f"{src}/*.parquet")) - before:
            os.utime(f, (now - age_s, now - age_s))

    # three micro-batches in mtime order (watermark application lags a
    # batch, so the filler batch is what actually emits the window
    # before the late row shows up)
    write_chunk(on_time, 7200)
    write_chunk(filler, 3600)
    write_chunk(late, 0)
    streamed = run_streaming(
        spark,
        src,
        lambda s: tumbling_agg(s, size="1 hour", watermark="1 minute"),
        str(tmp_path / "ck_late"),
    )
    rows = [
        (r["w_start"], r["n"]) for r in streamed.collect() if r["w_start"].startswith("2024-01-02")
    ]
    # exactly one final row for the 00:00 window, counting only the
    # on-time event — the late event neither updated nor re-emitted it
    assert rows == [("2024-01-02 00:00:00", 1)], rows


def test_o4_streaming_dedup(spark, events, tmp_path):
    """dropDuplicatesWithinWatermark on a source with injected dups."""
    src = str(tmp_path / "dup_src")
    sample = events.limit(200)
    sample.coalesce(1).write.mode("append").parquet(src)
    sample.coalesce(1).write.mode("append").parquet(src)  # exact dup chunk
    streamed = run_streaming(
        spark,
        src,
        lambda s: s.withWatermark("ts", "90 days").dropDuplicatesWithinWatermark(["event_id"]),
        str(tmp_path / "ck_dup"),
        max_files_per_trigger=2,
    )
    assert streamed.count() == 200


def test_t6_stateful_session_tracker(spark, events, tmp_path):
    """applyInPandasWithState sessionizer: the closed sessions it
    emits must be a prefix-consistent subset of the declarative
    session_window result (the tail session per user stays open)."""
    from meepo_spark.streaming.stateful import session_tracker

    src = str(tmp_path / "st_src")
    one_user = events.filter(F.col("user_id") == events.select("user_id").first()[0])
    replay_as_files(one_user, src, n_chunks=3)
    streamed = run_streaming(
        spark,
        src,
        session_tracker,
        str(tmp_path / "ck_state"),
        output_mode="append",
    )
    got = {
        (
            r["user_id"],
            r["first_ts"].strftime("%Y-%m-%d %H:%M:%S"),
            r["last_ts"].strftime("%Y-%m-%d %H:%M:%S"),
            r["n_events"],
        )
        for r in drop_flush(streamed).collect()
    }
    # compare against the GRADED t23 twin (the tracker's exact output
    # contract incl. raw last_ts — VERDICT r4 #6), restricted to the
    # replayed user
    from conftest import SF_DIR

    from meepo_spark.registry import QUERIES, load_all

    load_all()
    batch = QUERIES["t23_session_tracker"](spark, SF_DIR).filter(
        F.col("user_id") == one_user.select("user_id").first()[0]
    )
    want = {
        (r["user_id"], r["first_ts"], r["last_ts"], r["n_events"])
        for r in batch.collect()
    }
    assert got, "stateful tracker emitted nothing"
    assert got <= want, f"sessions disagree: extra={got - want}"


def test_t7_available_now_is_deterministic(spark, events, replay_dir, tmp_path):
    """Two independent availableNow runs over the same files produce
    identical results (the property every graded streaming check
    relies on)."""
    r1 = drop_flush(run_streaming(
        spark, replay_dir, lambda s: tumbling_agg(s, watermark="1 minute"), str(tmp_path / "c1")
    )).collect()
    r2 = drop_flush(run_streaming(
        spark, replay_dir, lambda s: tumbling_agg(s, watermark="1 minute"), str(tmp_path / "c2")
    )).collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))


def test_j8_stream_static_join(spark, events, replay_dir, tmp_path):
    """J8: streaming events enriched against a static dimension (each
    user's first-seen day, computed in batch). Stream-static joins
    need no watermark on the static side — Spark re-broadcasts the
    dim per micro-batch; result must equal the batch join."""
    user_dim = (
        events.groupBy("user_id")
        .agg(F.date_format(F.min("ts"), "yyyy-MM-dd").alias("cohort_day"))
    )

    def enrich(stream):
        return (
            stream.join(user_dim, "user_id")
            .select("event_id", "user_id", "cohort_day", "event_type")
        )

    streamed = drop_flush(
        run_streaming(spark, replay_dir, enrich, str(tmp_path / "ck_j8"))
    )
    batch = enrich(events)
    assert_batch_equivalent(
        spark, batch, streamed, ["event_id", "user_id", "cohort_day", "event_type"]
    )


def test_j9_stream_stream_join(spark, events, replay_dir, tmp_path):
    """J9: watermarked stream-stream join — every view followed by a
    purchase from the same user within 24h. Both sides carry a
    watermark and the join condition bounds event-time distance, so
    state for either side is droppable once the watermark passes;
    without the bound the join state would grow forever at 100 TB."""

    def paired(stream):
        views = (
            stream.filter(F.col("event_type") == "view")
            .select(
                F.col("user_id").alias("v_user"),
                F.col("event_id").alias("view_id"),
                F.col("ts").alias("v_ts"),
            )
            .withWatermark("v_ts", "1 hour")
        )
        buys = (
            stream.filter(F.col("event_type") == "purchase")
            .select(
                F.col("user_id").alias("b_user"),
                F.col("event_id").alias("buy_id"),
                F.col("ts").alias("b_ts"),
            )
            .withWatermark("b_ts", "1 hour")
        )
        return views.join(
            buys,
            (F.col("v_user") == F.col("b_user"))
            & (F.col("b_ts") > F.col("v_ts"))
            & (F.col("b_ts") <= F.col("v_ts") + F.expr("INTERVAL 24 HOURS")),
        ).select("v_user", "view_id", "buy_id")

    streamed = run_streaming(spark, replay_dir, paired, str(tmp_path / "ck_j9"))
    batch = paired(events)  # same spec in batch (watermarks are no-ops)
    assert_batch_equivalent(spark, batch, streamed, ["v_user", "view_id", "buy_id"])


def test_s4_rate_micro_batch_source(spark, tmp_path):
    """S4: the rate-micro-batch source — Spark's deterministic
    synthetic stream (exactly rowsPerBatch rows per micro-batch,
    values 0,1,2,... in order). Three batches through a memory sink
    must yield the contiguous prefix 0..3*rowsPerBatch-1 with the
    (timestamp, value) schema — the load generator for soak-testing
    sinks without fixture files."""
    rows_per_batch = 50
    stream = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("numPartitions", 4)
        .load()
    )
    assert [f.name for f in stream.schema.fields] == ["timestamp", "value"]
    q = (
        stream.writeStream.format("memory")
        .queryName("s4_rate_smoke")
        .option("checkpointLocation", str(tmp_path / "ck_rate"))
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    try:
        import time

        deadline = time.time() + 60
        target = 3 * rows_per_batch
        while time.time() < deadline:
            if spark.table("s4_rate_smoke").count() >= target:
                break
            time.sleep(0.3)
    finally:
        q.stop()
    got = spark.table("s4_rate_smoke")
    n = got.count()
    assert n >= target
    stats = got.agg(
        F.min("value").alias("lo"), F.max("value").alias("hi"),
        F.countDistinct("value").alias("d"),
    ).collect()[0]
    # contiguous, duplicate-free prefix: exactly-once batch delivery
    assert stats.lo == 0 and stats.d == n and stats.hi == n - 1


def test_t6b_transform_with_state_running_totals(spark, events, tmp_path):
    """transformWithState (Spark 4 StatefulProcessor + RocksDB state
    store): after draining the replayed stream, each user's LAST
    emitted running total must equal the batch aggregate over the same
    rows — the update-mode invariant that makes keyed state rebuilds
    trustworthy.

    transformWithState's driver worker speaks protobuf to the JVM
    state server; skip where google.protobuf isn't installed (this
    container) — applyInPandasWithState (t6) is the proven path."""
    import pytest

    pytest.importorskip("google.protobuf")
    from meepo_spark.streaming.stateful import running_totals

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        src = str(tmp_path / "tws_src")
        some = events.filter(F.col("user_id") < 50)
        replay_as_files(some, src, n_chunks=3)
        streamed = run_streaming(
            spark,
            src,
            running_totals,
            str(tmp_path / "ck_tws"),
            output_mode="update",
        )
        last = {
            r["user_id"]: (r["n_events"], round(r["total_value"], 2))
            for r in streamed.orderBy("user_id", "n_events").collect()
        }
        want = {
            r["user_id"]: (r["n"], round(r["tv"], 2))
            for r in some.groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
            .collect()
        }
        assert last, "no state emitted"
        assert last == want
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_j9b_stream_stream_left_outer_join(spark, events, replay_dir, tmp_path):
    """J9b: watermarked stream-stream LEFT OUTER join — views that
    never converted within 24h must STILL be emitted (with null
    buy_id), which is the part inner joins don't exercise: an
    unmatched left row can only be released once the watermark proves
    no matching right row can arrive. The replay harness's flush
    sentinel rides through BOTH side-filters so the final watermark
    passes every real event — without it the tail of unmatched views
    would be held in state forever under availableNow."""
    from meepo_spark.streaming.harness import FLUSH_EVENT_TYPE, FLUSH_USER_ID

    def unconverted(stream, keep_flush):
        types_v = ["view"] + ([FLUSH_EVENT_TYPE] if keep_flush else [])
        types_b = ["purchase"] + ([FLUSH_EVENT_TYPE] if keep_flush else [])
        views = (
            stream.filter(F.col("event_type").isin(types_v))
            .select(
                F.col("user_id").alias("v_user"),
                F.col("event_id").alias("view_id"),
                F.col("ts").alias("v_ts"),
            )
            .withWatermark("v_ts", "1 hour")
        )
        buys = (
            stream.filter(F.col("event_type").isin(types_b))
            .select(
                F.col("user_id").alias("b_user"),
                F.col("event_id").alias("buy_id"),
                F.col("ts").alias("b_ts"),
            )
            .withWatermark("b_ts", "1 hour")
        )
        return views.join(
            buys,
            (F.col("v_user") == F.col("b_user"))
            & (F.col("b_ts") > F.col("v_ts"))
            & (F.col("b_ts") <= F.col("v_ts") + F.expr("INTERVAL 24 HOURS")),
            "left_outer",
        ).select("v_user", "view_id", "buy_id")

    streamed = run_streaming(
        spark,
        replay_dir,
        lambda s: unconverted(s, keep_flush=True),
        str(tmp_path / "ck_j9b"),
    ).filter(F.col("v_user") != FLUSH_USER_ID)
    batch = unconverted(events, keep_flush=False)
    assert_batch_equivalent(spark, batch, streamed, ["v_user", "view_id", "buy_id"])
    # the left-outer part actually fired: some views are unconverted
    assert streamed.filter(F.col("buy_id").isNull()).count() > 0


def test_j9c_stream_stream_full_outer_join(spark, events, replay_dir, tmp_path):
    """J9c (VERDICT r4 #6): watermarked stream-stream FULL OUTER join
    — BOTH unmatched classes must surface: views that never converted
    within 24h (null buy_id) AND purchases with no preceding view
    (null view_id), each releasable only once the watermark proves no
    partner can arrive. Batch twin = the same spec with no-op
    watermarks; its per-user census is the graded
    t24_full_outer_converts oracle row."""
    from meepo_spark.streaming.harness import FLUSH_EVENT_TYPE, FLUSH_USER_ID

    def converts(stream, keep_flush):
        types_v = ["view"] + ([FLUSH_EVENT_TYPE] if keep_flush else [])
        types_b = ["purchase"] + ([FLUSH_EVENT_TYPE] if keep_flush else [])
        views = (
            stream.filter(F.col("event_type").isin(types_v))
            .select(
                F.col("user_id").alias("v_user"),
                F.col("event_id").alias("view_id"),
                F.col("ts").alias("v_ts"),
            )
            .withWatermark("v_ts", "1 hour")
        )
        buys = (
            stream.filter(F.col("event_type").isin(types_b))
            .select(
                F.col("user_id").alias("b_user"),
                F.col("event_id").alias("buy_id"),
                F.col("ts").alias("b_ts"),
            )
            .withWatermark("b_ts", "1 hour")
        )
        return views.join(
            buys,
            (F.col("v_user") == F.col("b_user"))
            & (F.col("b_ts") > F.col("v_ts"))
            & (F.col("b_ts") <= F.col("v_ts") + F.expr("INTERVAL 24 HOURS")),
            "full_outer",
        ).select("v_user", "view_id", "b_user", "buy_id")

    streamed = run_streaming(
        spark,
        replay_dir,
        lambda s: converts(s, keep_flush=True),
        str(tmp_path / "ck_j9c"),
    ).filter(
        (F.col("v_user").isNull() | (F.col("v_user") != FLUSH_USER_ID))
        & (F.col("b_user").isNull() | (F.col("b_user") != FLUSH_USER_ID))
    )
    batch = converts(events, keep_flush=False)

    # null-coalesce before comparing: full-outer rows carry NULLs in
    # the leading keys and Python tuple sort can't order None vs int
    def cmp_cols(df):
        return df.select(
            *[
                F.coalesce(F.col(c), F.lit(-999)).alias(c)
                for c in ["v_user", "view_id", "b_user", "buy_id"]
            ]
        )

    assert_batch_equivalent(
        spark,
        cmp_cols(batch),
        cmp_cols(streamed),
        ["v_user", "view_id", "b_user", "buy_id"],
    )
    # both outer classes actually fired
    assert streamed.filter(F.col("buy_id").isNull()).count() > 0
    assert streamed.filter(F.col("view_id").isNull()).count() > 0


def test_observe_metrics_piggyback_on_query(spark, events):
    """`df.observe` — accumulator-style metrics collected DURING a
    query (row counts, value sums, null tallies) with zero extra
    passes. At 100 TB a separate COUNT(*) validation query would
    re-scan the table; observe rides the scan the query was already
    doing — it is the DQ hook that makes dq1/dq2-style checks free
    in production pipelines."""
    from pyspark.sql import Observation

    obs = Observation("ingest_stats")
    observed = events.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("value").alias("total_value"),
        F.sum(F.col("props").isNull().cast("int")).alias("null_props"),
    )
    daily = (
        observed.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    n_days = daily.count()  # action triggers metric collection
    got = obs.get
    assert got["n_rows"] == events.count()
    assert got["null_props"] == 0
    assert abs(got["total_value"] - events.agg(F.sum("value")).first()[0]) < 1e-6
    assert n_days > 0


def test_streaming_query_listener_observes_progress(spark, events, replay_dir, tmp_path):
    """StreamingQueryListener — the ops hook a production pipeline
    hangs its lag/throughput dashboards on. Progress events must
    arrive per micro-batch with real row counts; the total across
    batches equals the data actually processed (plus the harness's
    flush sentinel)."""
    from pyspark.sql.streaming import StreamingQueryListener

    seen = {"progress": [], "started": 0, "terminated": 0}

    class Probe(StreamingQueryListener):
        def onQueryStarted(self, event):
            seen["started"] += 1

        def onQueryProgress(self, event):
            seen["progress"].append(event.progress.numInputRows)

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            seen["terminated"] += 1

    spark.streams.addListener(probe := Probe())
    try:
        streamed = run_streaming(
            spark,
            replay_dir,
            lambda s: s.groupBy("event_type").count(),
            str(tmp_path / "ck_listener"),
            output_mode="complete",
        )
        assert streamed.count() > 0
        import time

        deadline = time.time() + 30
        while time.time() < deadline and (
            seen["started"] == 0 or seen["terminated"] == 0
        ):
            time.sleep(0.5)
        assert seen["started"] >= 1 and seen["terminated"] >= 1
        total_rows = sum(seen["progress"])
        assert total_rows == events.count() + 1  # + flush sentinel
    finally:
        spark.streams.removeListener(probe)


def test_streaming_observe_metrics_per_batch(spark, events, replay_dir, tmp_path):
    """observe() on a STREAM: per-micro-batch observed metrics ride
    the listener's progress events — the streaming DQ hook (row
    tallies, value sums, null counts per batch) with zero extra
    passes over the stream. Batch sums must reconcile exactly with
    the replayed data plus the harness flush sentinel."""
    import time

    from pyspark.sql.streaming import StreamingQueryListener

    captured = []

    class Probe(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            om = event.progress.observedMetrics
            if "ingest" in om:
                captured.append((om["ingest"]["n"], om["ingest"]["v"]))

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    spark.streams.addListener(probe := Probe())
    try:
        streamed = run_streaming(
            spark,
            replay_dir,
            lambda s: s.observe(
                "ingest",
                F.count(F.lit(1)).alias("n"),
                F.sum("value").alias("v"),
            ).groupBy("event_type").count(),
            str(tmp_path / "ck_obs_stream"),
            output_mode="complete",
        )
        assert streamed.count() > 0
        deadline = time.time() + 30
        want_rows = events.count() + 1  # + flush sentinel
        while time.time() < deadline and sum(c[0] for c in captured) < want_rows:
            time.sleep(0.5)
        assert sum(c[0] for c in captured) == want_rows
        got_v = sum(c[1] for c in captured)
        want_v = events.agg(F.sum("value")).first()[0]  # sentinel value=0
        assert abs(got_v - want_v) < 1e-6
        assert len(captured) >= 3  # metrics arrived per micro-batch
    finally:
        spark.streams.removeListener(probe)


def test_a17_streaming_ivm_merge_equals_recompute(spark, events, tmp_path):
    """A17 end-to-end through Structured Streaming: a materialized
    per-user aggregate maintained by foreachBatch — each micro-batch's
    PARTIAL aggregate merges into the stored state (union + re-reduce
    over decomposable count/cents-sum/max), never rescanning history.
    After the availableNow replay drains, the state must equal a batch
    recompute over all events — the merge==recompute invariant a17
    proves via oracle, here proven through the actual streaming sink
    path with multiple micro-batches."""
    from meepo_spark.schemas import EVENTS

    src = str(tmp_path / "ivm_src")
    replay_as_files(events, src, n_chunks=4, flush=False)

    state_root = str(tmp_path / "ivm_state")

    def partial(df):
        return (
            df.select(
                "user_id",
                F.round(F.col("value") * 100).cast("long").alias("cents"),
                "ts",
            )
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("cents").alias("c"),
                F.max("ts").alias("m"),
            )
        )

    def merge_batch(batch_df, epoch_id):
        import os

        delta = partial(batch_df)
        prev_dir = f"{state_root}/v{epoch_id - 1}"
        if os.path.isdir(prev_dir):
            prev = batch_df.sparkSession.read.parquet(prev_dir)
            merged = (
                prev.unionByName(delta)
                .groupBy("user_id")
                .agg(F.sum("n").alias("n"), F.sum("c").alias("c"), F.max("m").alias("m"))
            )
        else:
            merged = delta
        merged.write.mode("overwrite").parquet(f"{state_root}/v{epoch_id}")

    q = (
        spark.readStream.schema(EVENTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", str(tmp_path / "ivm_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    import glob
    import os

    versions = sorted(
        glob.glob(f"{state_root}/v*"), key=lambda p: int(p.rsplit("v", 1)[1])
    )
    assert len(versions) >= 3, "expected multiple micro-batches"
    final = spark.read.parquet(versions[-1])
    expect = partial(events)
    got = {tuple(r) for r in final.collect()}
    want = {tuple(r) for r in expect.collect()}
    assert got == want


def test_t14_sliding_distinct_streams_exactly(spark, events, tmp_path):
    """T14\'s rolling-24h EXACT distinct is streamable: the sliding
    window(24h, 1h) replicates each event into its <= 24 windows,
    dropDuplicates([w, user_id]) dedups per window, and a windowed
    count emits the exact distinct — two CHAINED stateful operators
    (dedup -> agg), the Spark-3.4+ multi-stateful pipeline, driven to
    completion under availableNow. Every hour the batch t14 query
    reports whose full trailing window lies inside the replay must be
    reproduced exactly by the stream (window [start, start+24h)
    relabeled by its inclusive last hour, start+23h).

    Trap this test documents: do NOT filter the flush sentinel before
    the aggregation — Catalyst pushes a deterministic filter BELOW the
    EventTimeWatermark node, so the sentinel row is dropped before it
    can advance the watermark and the tail windows never emit. The
    sentinel must flow through the pipeline and be excluded from the
    comparison instead (its windows sit 30 days past the data)."""
    import datetime

    from conftest import SF_DIR
    from meepo_spark.registry import QUERIES, load_all

    load_all()

    src = str(tmp_path / "t14_src")
    replay_as_files(events, src, n_chunks=4)

    def sliding_distinct(s):
        return (
            s.withWatermark("ts", "1 minute")
            .select(F.window("ts", "24 hours", "1 hour").alias("w"), "user_id")
            .dropDuplicates(["w", "user_id"])
            .groupBy("w")
            .count()
        )

    streamed = run_streaming(
        spark, src, sliding_distinct, str(tmp_path / "ck_t14")
    )
    got_by_hr = {
        (r["w"]["start"] + datetime.timedelta(hours=23)).strftime(
            "%Y-%m-%d %H:00"
        ): r["count"]
        for r in streamed.collect()
    }
    assert got_by_hr, "stream emitted nothing"

    batch = QUERIES["t14_sliding_distinct"](spark, SF_DIR)
    lo, hi = events.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    lo_hr = lo.replace(minute=0, second=0, microsecond=0)
    hi_hr = hi.replace(minute=0, second=0, microsecond=0)
    checked = 0
    for r in batch.collect():
        hr_ts = datetime.datetime.strptime(r["hr"], "%Y-%m-%d %H:00")
        # only hours whose full 24h trailing window lies inside the
        # replay (earlier hours see partial data on the batch side too,
        # but the stream never saw pre-replay events)
        if hr_ts - datetime.timedelta(hours=23) < lo_hr or hr_ts > hi_hr:
            continue
        assert got_by_hr.get(r["hr"]) == r["active_24h"], (
            "hour %s: stream=%s batch=%s"
            % (r["hr"], got_by_hr.get(r["hr"]), r["active_24h"])
        )
        checked += 1
    assert checked > 10, "only %d fully-covered hours compared" % checked


def test_l10s_streaming_incremental_dedup_batch_equivalence(spark, sf_dir, tmp_path):
    """VERDICT r3 #4 — the streaming member of the L2 family: ingest
    the l10 'incoming' slice (doc_id % 5 == 4) as doc_id-ordered file
    batches through the foreachBatch incremental-dedup pipeline
    (within-batch hash keeper -> corpus/prior exact probe -> MinHash-
    LSH near-dup probe vs earlier-id survivors -> idempotent per-batch
    index commit), then assert the admitted set equals the one-shot
    batch computation of the same rule over the full ingest set."""
    from pyspark.sql import Window as W

    from meepo_spark.operators.dedup import minhash_near_dup_pairs
    from meepo_spark.schemas import DOCUMENTS
    from meepo_spark.streaming.incremental_dedup import (
        admitted_docs,
        start_incremental_dedup,
    )

    d = table(spark, sf_dir, "documents")
    corpus_hashes = (
        d.filter(F.col("doc_id") % 5 != 4).select(F.md5("text").alias("h")).distinct()
    )
    incoming = d.filter(F.col("doc_id") % 5 == 4)

    src = str(tmp_path / "src")
    chunked = incoming.withColumn("__chunk", F.ntile(4).over(W.orderBy("doc_id")))
    # ADVICE r4: FileStreamSource orders by mtime with nondeterministic
    # tie-breaks — sequentially-appended chunks can tie on coarse-mtime
    # filesystems and reorder batches. Force strictly-monotone mtimes
    # so the doc_id-ordered replay convention is structural, and let
    # the pipeline ASSERT it (enforce_replay_order below).
    import glob as _glob
    import os as _os

    stamped: set[str] = set()
    for i in range(1, 5):
        (
            chunked.filter(F.col("__chunk") == i)
            .drop("__chunk")
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
        for p in _glob.glob(src + "/*.parquet"):
            if p not in stamped:
                _os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
                stamped.add(p)

    index_dir = str(tmp_path / "index")
    start_incremental_dedup(
        spark,
        src,
        DOCUMENTS,
        corpus_hashes,
        index_dir,
        checkpoint=str(tmp_path / "ckpt"),
        enforce_replay_order=True,
    )
    streamed = sorted(
        r[0] for r in admitted_docs(spark, index_dir).select("doc_id").collect()
    )

    # one-shot batch recompute of the identical rule
    hashed = incoming.select("doc_id", "lang", "text", F.md5("text").alias("h"))
    keeper = hashed.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
    exact_surv = hashed.join(keeper, ["h", "doc_id"]).join(
        corpus_hashes, "h", "left_anti"
    )
    pairs = minhash_near_dup_pairs(
        exact_surv, "text", "doc_id", threshold=0.6, shingle_k=3,
        num_hashes=96, bands=48,
    )
    rejected = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    batch = sorted(
        r[0]
        for r in exact_surv.join(rejected, "doc_id", "left_anti")
        .select("doc_id")
        .collect()
    )
    assert len(streamed) > 0
    assert streamed == batch, (
        f"streamed {len(streamed)} admitted vs batch {len(batch)}; "
        f"diff={set(streamed) ^ set(batch)}"
    )


def test_l10s_incremental_dedup_rejection_paths(spark, tmp_path):
    """Deterministic micro-fixture hitting every incremental-dedup
    path (the sf0.001 slice has no exact dups, so the equivalence test
    alone under-exercises the probes): cross-batch exact dup, corpus
    exact dup, cross-batch NEAR dup (J=7/9), and a clean admit."""
    from meepo_spark.schemas import DOCUMENTS
    from meepo_spark.streaming.incremental_dedup import (
        admitted_docs,
        read_survivor_index,
        start_incremental_dedup,
    )

    t1 = "the quick brown fox jumps over the lazy dog today"
    t_corpus = "corpus document text one two three four five six"
    rows1 = [(1, t1, "en", "web", len(t1))]
    rows2 = [
        (2, t1, "en", "web", len(t1)),                # exact dup of 1 (prior batch)
        (3, t_corpus, "en", "web", len(t_corpus)),    # exact dup vs corpus
        (4, t1.replace("today", "tonight"), "en", "web", 50),  # near dup of 1
        (5, "completely different unrelated content words here now", "en", "web", 52),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(spark.sparkContext.parallelize(rows1, 1), DOCUMENTS).write.mode("append").parquet(src)
    spark.createDataFrame(spark.sparkContext.parallelize(rows2, 1), DOCUMENTS).write.mode("append").parquet(src)
    corpus_hashes = spark.createDataFrame([(t_corpus,)], "t string").select(
        F.md5("t").alias("h")
    )

    index_dir = str(tmp_path / "index")
    start_incremental_dedup(
        spark, src, DOCUMENTS, corpus_hashes, index_dir,
        checkpoint=str(tmp_path / "ckpt"),
    )
    idx = {
        r["doc_id"]: r["rejected"]
        for r in read_survivor_index(spark, index_dir).collect()
    }
    # 2 and 3 never reach the index (exact-probed out); 4 is indexed
    # but near-dup rejected; 1 and 5 admitted
    assert idx == {1: False, 4: True, 5: False}, idx
    admitted = sorted(r[0] for r in admitted_docs(spark, index_dir).select("doc_id").collect())
    assert admitted == [1, 5]


def test_l10s_replay_excludes_own_batch_partition(spark, tmp_path):
    """Code-review r4 #1: a foreachBatch REPLAY of batch N must not
    read its own earlier commit as 'prior corpus' — doing so would
    exact-probe away every doc in the batch and overwrite batch=N
    empty. read_survivor_index(exclude_batch=N) is the guard; this
    pins its semantics against the committed layout."""
    from meepo_spark.schemas import DOCUMENTS
    from meepo_spark.streaming.incremental_dedup import (
        INDEX_SCHEMA,
        read_survivor_index,
        start_incremental_dedup,
    )

    t = "some document text for the replay idempotence check"
    src = str(tmp_path / "src")
    spark.createDataFrame([(1, t, "en", "web", len(t))], DOCUMENTS).coalesce(
        1
    ).write.mode("append").parquet(src)
    corpus_hashes = spark.createDataFrame([("unrelated",)], "t string").select(
        F.md5("t").alias("h")
    )
    index_dir = str(tmp_path / "index")
    start_incremental_dedup(
        spark, src, DOCUMENTS, corpus_hashes, index_dir,
        checkpoint=str(tmp_path / "ckpt"),
    )
    # batch 0 committed; a replay of batch 0 must see an EMPTY prior
    assert read_survivor_index(spark, index_dir).count() == 1
    assert read_survivor_index(spark, index_dir, exclude_batch=0).count() == 0
    # and an unseen index dir reads as empty, not as an error
    assert (
        read_survivor_index(spark, str(tmp_path / "nope")).schema == INDEX_SCHEMA
    )


def test_session_gap_exact_tie_merges_cross_engine(spark):
    """Code-review r5 #6 probe, resolved EMPIRICALLY: an event exactly
    gap after the previous one MERGES into the session in Spark's
    session_window (verified: 3 events at 0/30/59:59 min with a 30-min
    gap -> ONE session), matching the t23 oracle's `<= INTERVAL` gap
    island and the stateful tracker's strict-`>` close. This pins the
    exact-boundary convention for all three so a fixture regen with a
    real tie can never silently diverge."""
    import datetime

    import duckdb

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0),
        (1, t0 + datetime.timedelta(minutes=30)),  # exact-gap tie
        (1, t0 + datetime.timedelta(minutes=59, seconds=59)),
        (2, t0),
        (2, t0 + datetime.timedelta(minutes=30, seconds=1)),  # past gap
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    got = sorted(
        (r["user_id"], r["n"])
        for r in df.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    # multiset compare: user 1 ONE session of 3 (tie merged); user 2
    # TWO sessions of 1 (a set literal would collapse the duplicate)
    assert got == [(1, 3), (2, 1), (2, 1)]
    n_sessions = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .count()
        .groupBy("user_id")
        .count()
        .collect()
    )
    spark_sessions = {r["user_id"]: r["count"] for r in n_sessions}
    assert spark_sessions == {1: 1, 2: 2}

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({u}, TIMESTAMP '{ts}')" for u, ts in rows
        )
        + ") t(user_id, ts)"
    )
    oracle_sessions = dict(
        con.execute(
            """
        WITH g AS (
            SELECT user_id, ts,
                   CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 30 MINUTE
                        THEN 0 ELSE 1 END AS new_s
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
        )
        SELECT user_id, CAST(SUM(new_s) AS BIGINT) FROM g GROUP BY 1
        """
        ).fetchall()
    )
    assert oracle_sessions == spark_sessions
    # the stateful tracker's close condition is strict `>` gap —
    # diff == gap stays in-session, the same convention
    from meepo_spark.streaming.stateful import GAP_MS

    assert 30 * 60 * 1000 == GAP_MS


@pytest.mark.parametrize(
    "delta_s, wm_spec, wm_s, expect_loss",
    [
        (259200, "73 hours", 262800, False),  # W > delta
        (259200, "72 hours", 259200, False),  # W = delta exactly (tight bound)
        (259200, "12 hours", 43200, True),    # W < delta (230-row census)
        (259200, "2 hours", 7200, True),      # W << delta (378-row census)
    ],
)
def test_watermark_disorder_bound_equivalence(
    spark, events, tmp_path, delta_s, wm_spec, wm_s, expect_loss
):
    """VERDICT r8 #4 — the closed-form contract that sizes watermarks
    in production: replay the events fixture with a KNOWN disorder
    bound δ (odd event_ids arrive δ seconds late; lateness ≤ δ by
    construction — the a20 max_regression_s measurement, here made
    exact). Then for a tumbling aggregation with watermark W:

    * W ≥ δ  ⇒ the streamed result is EXACTLY the batch result — no
      row can be late beyond the watermark, so nothing is ever lost;
    * W < δ  ⇒ the streamed result is exactly the batch result over
      the fixture MINUS the closed-form late-row census: a row
      arriving in micro-batch b is lost iff its window end ≤
      max event time over batches ≤ b−2, minus W. The lag is TWO
      batches, not one, and was pinned empirically (isolation
      experiment, round 9): Spark's late-row filter is planned with
      the watermark of the PREVIOUS trigger, so a late row landing in
      the very batch whose (current) watermark first passes its
      window end is still MERGED and emitted with the window —
      merge-then-evict — while a row arriving one batch later finds
      the state evicted and is dropped. Both directions are graded
      here: the census is computed in batch from the identical
      deterministic chunk assignment the replay used, so per-batch
      watermarks are a pure function of the fixture.

    The W < δ cases assert the census is NON-empty (the property
    can't pass vacuously), and every case asserts streamed ≡
    batch-over-survivors, which for W ≥ δ degenerates to plain batch
    equivalence."""
    from pyspark.sql import Window as Win

    from meepo_spark.streaming.harness import replay_with_bounded_disorder

    n_chunks = 24
    src = str(tmp_path / "disorder_src")
    replay_with_bounded_disorder(events, src, delta_s, n_chunks=n_chunks)

    streamed = run_streaming(
        spark,
        src,
        lambda s: tumbling_agg(s, size="1 day", watermark=wm_spec),
        str(tmp_path / "ck"),
        max_files_per_trigger=1,
    )

    # batch-side census: identical chunk assignment, closed-form
    # per-chunk watermark = running max ts over EARLIER chunks − W
    arr = events.withColumn(
        "__arr",
        F.col("ts")
        + F.make_interval(
            secs=F.when(F.col("event_id") % 2 == 1, F.lit(delta_s))
            .otherwise(F.lit(0))
            .cast("double")
        ),
    )
    chunked = arr.withColumn(
        "__chunk", F.ntile(n_chunks).over(Win.orderBy("__arr", "event_id"))
    )
    # lag 2: the filter watermark of batch b (chunk c = batch c-1)
    # reflects event time through batch b-2 only — see docstring
    prev_max = (
        Win.orderBy("__chunk")
        .rowsBetween(Win.unboundedPreceding, -2)
    )
    cmax = (
        chunked.groupBy("__chunk")
        .agg(F.max("ts").alias("cmax"))
        .select("__chunk", F.max("cmax").over(prev_max).alias("prev_max"))
    )
    rows = chunked.join(cmax, "__chunk").withColumn(
        "lost",
        F.col("prev_max").isNotNull()
        & (
            F.window("ts", "1 day").end
            <= F.col("prev_max") - F.make_interval(secs=F.lit(float(wm_s)))
        ),
    )
    n_lost = rows.filter("lost").count()
    if expect_loss:
        assert n_lost > 0, "census empty — the W < delta case proved nothing"
    else:
        assert n_lost == 0, f"W >= delta must lose nothing, census says {n_lost}"

    survivors = rows.filter(~F.col("lost")).select(*events.columns)
    expected = tumbling_agg(survivors, size="1 day")
    cols = ["w_start", "w_end", "event_type", "n", "total_value"]
    assert_batch_equivalent(spark, expected, drop_flush(streamed), cols)
    if not expect_loss:
        assert_batch_equivalent(
            spark, tumbling_agg(events, size="1 day"), drop_flush(streamed), cols
        )
