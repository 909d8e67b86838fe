"""Source robustness: malformed-record quarantine on the semi-
structured readers (S2). FAILFAST is the graded queries' posture
(fail loud on schema drift); PERMISSIVE + _corrupt_record is the
production bulk-ingest posture — bad rows land in a quarantine
column instead of killing a 100 TB load, mirroring the streaming
DLQ discipline in cdc/fanout.py."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from conftest import SF_DIR
from meepo_spark.catalog import table

ROWS = [
    '{"k": 1, "name": "ok-1"}',
    '{"k": 2, "name": "ok-2"}',
    '{"k": "not-a-number", "name": "bad-type"}',
    '{broken json',
    '{"k": 5, "name": "ok-5"}',
]

SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("name", StringType()),
        StructField("_corrupt_record", StringType()),
    ]
)


def test_s2_permissive_quarantines_bad_rows(spark, tmp_path):
    src = tmp_path / "in.json"
    src.write_text("\n".join(ROWS) + "\n")

    df = (
        spark.read.schema(SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(src))
        .cache()  # required: corrupt-record queries must not re-parse per action
    )
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())

    assert good.count() == 3
    assert sorted(r.k for r in good.collect()) == [1, 2, 5]
    # the quarantine keeps the raw line for replay after a schema fix
    bad_raw = sorted(r._corrupt_record for r in bad.collect())
    assert bad_raw == ['{"k": "not-a-number", "name": "bad-type"}', "{broken json"]
    df.unpersist()


def test_s2_failfast_raises_on_bad_rows(spark, tmp_path):
    src = tmp_path / "in.json"
    src.write_text("\n".join(ROWS) + "\n")
    strict = StructType([StructField("k", LongType()), StructField("name", StringType())])
    try:
        spark.read.schema(strict).option("mode", "FAILFAST").json(str(src)).collect()
        raised = False
    except Exception:
        raised = True
    assert raised, "FAILFAST must refuse malformed input"


def test_s2c_orc_round_trip(spark, sf_dir, tmp_path):
    """S2: ORC source/sink — Spark's other native columnar format.
    Write the nation fixture out as ORC, read it back, and prove the
    reader path end-to-end: row parity with the parquet original plus
    predicate pushdown surviving into the OrcScan."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    out = str(tmp_path / "nation_orc")
    nation.write.format("orc").save(out)

    back = spark.read.format("orc").load(out)
    assert back.schema == nation.schema
    assert sorted(r.n_nationkey for r in back.collect()) == sorted(
        r.n_nationkey for r in nation.collect()
    )

    pushed = back.filter(F.col("n_nationkey") < 5).select("n_name")
    plan = pushed._jdf.queryExecution().executedPlan().toString()
    assert "FileScan orc" in plan and "PushedFilters: [" in plan, plan
    assert "LessThan(n_nationkey,5)" in plan.replace(" ", ""), plan
    assert pushed.count() == nation.filter("n_nationkey < 5").count()


def test_s7_python_datasource_changelog(spark, sf_dir):
    """S7: custom Python DataSource (pyspark.sql.datasource) — the
    connector seam for feeds Spark has no native reader for. Row-level
    parity against the catalog's events load (including the ns→µs
    timestamp truncation both paths must agree on) and row-group
    partition parallelism."""
    from meepo_spark.catalog import table
    from meepo_spark.sources.pyds import register_changelog_source

    register_changelog_source(spark)
    df = (
        spark.read.format("meepo_changelog")
        .option("path", f"{sf_dir}/events.parquet")
        .load()
    )
    ref = table(spark, sf_dir, "events").select(*df.columns)
    assert df.schema == ref.schema
    assert df.rdd.getNumPartitions() >= 1
    assert df.exceptAll(ref).count() == 0
    assert ref.exceptAll(df).count() == 0


def test_s7b_python_datasource_streaming_tail(spark, sf_dir, tmp_path):
    """S7: the changelog connector's STREAMING face — offset-tailing
    micro-batches (SimpleDataSourceStreamReader). A continuous trigger
    drains the log in maxRowsPerBatch-capped batches against a
    checkpoint (simple stream readers prefetch ONE batch per trigger,
    so availableNow would stop after the first — a real tail runs on a
    processing-time trigger); the union of micro-batches must equal
    the batch read exactly, and the cap must actually split the load
    into multiple batches."""
    from meepo_spark.sources.pyds import register_changelog_source

    register_changelog_source(spark)
    path = f"{sf_dir}/events.parquet"
    stream = (
        spark.readStream.format("meepo_changelog")
        .option("path", path)
        .option("maxRowsPerBatch", "300")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("s7b_tail")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    # tail until the log is drained (offset-capped micro-batches), then stop
    import time

    deadline = time.time() + 120
    while time.time() < deadline and spark.table("s7b_tail").count() < 1000:
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(30)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    got = spark.table("s7b_tail")
    ref = (
        spark.read.format("meepo_changelog").option("path", path).load()
    )
    assert n_batches >= 3, [p["numInputRows"] for p in q.recentProgress]
    assert got.count() == ref.count() == 1000
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0


def test_s7c_python_datasink_broadcast(spark, sf_dir, tmp_path):
    """S7: the custom STREAMING SINK — payloads published through the
    staged-commit writer must equal the batch payload set exactly, one
    commit marker per non-empty micro-batch, and no stragglers left in
    _staging."""
    import os

    from meepo_spark.cdc.events import ACTION_MAP, events_as_changes
    from meepo_spark.cdc.fanout import broadcast_payload
    from meepo_spark.sources.pyds import register_broadcast_sink, register_changelog_source

    register_changelog_source(spark)
    register_broadcast_sink(spark)
    out = str(tmp_path / "published")
    os.makedirs(out, exist_ok=True)

    stream = (
        spark.readStream.format("meepo_changelog")
        .option("path", f"{sf_dir}/events.parquet")
        .option("maxRowsPerBatch", "400")
        .load()
    )
    action = F.coalesce(
        *[
            F.when(F.col("event_type") == k, F.lit(v))
            for k, v in ACTION_MAP.items()
        ]
    )
    changes = stream.select(
        F.lit("users").alias("table"),
        action.alias("action"),
        F.col("user_id").cast("string").alias("pk"),
    )
    q = (
        broadcast_payload(changes)
        .writeStream.format("meepo_broadcast")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck_sink"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    import time

    def published():
        lines = []
        for f in os.listdir(out):
            if f.startswith("part-"):
                lines.extend(open(os.path.join(out, f)).read().splitlines())
        return lines

    deadline = time.time() + 120
    while time.time() < deadline and len(published()) < 1000:
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(30)

    got = sorted(published())
    want = sorted(
        r["value"]
        for r in broadcast_payload(
            events_as_changes(spark, sf_dir).select("table", "action", "pk")
        ).collect()
    )
    assert got == want
    n_markers = len(os.listdir(os.path.join(out, "_commits")))
    assert n_markers >= 3  # 1000 rows / 400-row cap
    assert not os.listdir(os.path.join(out, "_staging"))


def test_binaryfile_source_for_multimodal_blobs(spark, tmp_path):
    """`binaryFile` source — the ingestion seam for multimodal
    payloads (images/audio dropped as raw files): each file becomes
    one row of (path, modificationTime, length, content BINARY),
    which is exactly the opaque-binary + typed-metadata convention
    the L5 multimodal columns build on. pathGlobFilter prunes
    non-matching files at LISTING time (no read), the binary column
    feeds the same mapInPandas decode plumbing as l5b."""
    blob_dir = tmp_path / "blobs"
    blob_dir.mkdir()
    payloads = {f"img_{i:03d}.bin": bytes([i]) * (100 + i) for i in range(8)}
    for name, data in payloads.items():
        (blob_dir / name).write_bytes(data)
    (blob_dir / "notes.txt").write_text("not a blob")

    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(str(blob_dir))
    )
    rows = df.select(
        F.element_at(F.split("path", "/"), -1).alias("name"),
        "length",
        F.length("content").alias("n_bytes"),
        F.substring("content", 1, 1).alias("first_byte"),
    ).collect()
    assert len(rows) == 8  # txt filtered by glob, never opened
    by_name = {r["name"]: r for r in rows}
    for i in range(8):
        r = by_name[f"img_{i:03d}.bin"]
        assert r["length"] == 100 + i == r["n_bytes"]
        assert r["first_byte"] == bytes([i])


def test_catalog_managed_table_round_trip(spark):
    """Catalog surface: saveAsTable → spark.catalog listing →
    insertInto append → DROP TABLE. Managed tables are how derived
    datasets (event-store compactions, curated corpora) get a name
    other jobs can read without passing paths around; the catalog is
    also what Catalyst consults for statistics, so tables beat raw
    paths at scale."""
    db, tbl = "meepo_test_db", "nation_copy"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    try:
        nation = table(spark, SF_DIR, "nation")
        nation.write.mode("overwrite").saveAsTable(f"{db}.{tbl}")
        assert tbl in [t.name for t in spark.catalog.listTables(db)]
        assert spark.table(f"{db}.{tbl}").count() == nation.count()
        # append via insertInto doubles the rows
        nation.write.insertInto(f"{db}.{tbl}", overwrite=False)
        assert spark.table(f"{db}.{tbl}").count() == 2 * nation.count()
        # catalog exposes the schema
        cols = {c.name for c in spark.catalog.listColumns(f"{db}.{tbl}")}
        assert cols == set(nation.columns)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {db}.{tbl}")
        spark.sql(f"DROP DATABASE IF EXISTS {db}")


def test_analyze_table_feeds_cost_based_optimizer(spark):
    """ANALYZE TABLE → catalog statistics (row count, size, per-column
    NDV) that CBO join reordering and broadcast decisions read.
    SURVEY §4.2 commits to collecting stats for bench runs; this
    pins the mechanism: stats actually land in the catalog and carry
    a row count matching the data."""
    db, tbl = "meepo_stats_db", "orders_stats"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    try:
        orders = table(spark, SF_DIR, "orders")
        orders.write.mode("overwrite").saveAsTable(f"{db}.{tbl}")
        spark.sql(
            f"ANALYZE TABLE {db}.{tbl} COMPUTE STATISTICS FOR COLUMNS o_custkey"
        )
        desc = {
            r["col_name"]: r["data_type"]
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {db}.{tbl}").collect()
        }
        stats = desc.get("Statistics", "")
        assert f"{orders.count()} rows" in stats, stats
        col = {
            r["info_name"]: r["info_value"]
            for r in spark.sql(
                f"DESCRIBE EXTENDED {db}.{tbl} o_custkey"
            ).collect()
        }
        assert int(col["distinct_count"]) > 0
        # with CBO on, plan stats surface the cataloged row count
        old_cbo = spark.conf.get("spark.sql.cbo.enabled")
        try:
            spark.conf.set("spark.sql.cbo.enabled", "true")
            rel_stats = (
                spark.table(f"{db}.{tbl}")
                ._jdf.queryExecution()
                .optimizedPlan()
                .stats()
            )
            assert rel_stats.rowCount().get() == orders.count()
        finally:
            spark.conf.set("spark.sql.cbo.enabled", old_cbo)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {db}.{tbl}")
        spark.sql(f"DROP DATABASE IF EXISTS {db}")


def test_s10_readback_prunes_partitions(spark, sf_dir):
    """s10's claim: the event_type predicate lands in PartitionFilters
    (directory-level pruning), not in the post-scan row filter."""
    from meepo_spark.queries.sources import s10_partitioned_sink_roundtrip

    df = s10_partitioned_sink_roundtrip(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    part = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "purchase" in part
    # and the row-level data filters carry NO event_type predicate
    data = plan.split("DataFilters: [")[1].split("]")[0]
    assert "event_type" not in data


def test_s11_bucketed_join_is_exchange_free(spark, sf_dir):
    """s11's claim: with both sides bucketed 8 ways on the join key
    (and broadcast disabled so the planner can't sidestep the
    question), the SortMergeJoin consumes the bucketed scans DIRECTLY
    — no ShuffleExchange anywhere in the join subtree. That's the
    write-once-shuffle-never-again contract bucketing exists for."""
    from meepo_spark.queries.sources import s11_bucketed_smb_join

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = s11_bucketed_smb_join(spark, sf_dir)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    final = plan.split("== Initial Plan ==")[0]  # drop the AQE echo
    assert "SortMergeJoin" in final, plan
    assert final.count("Bucketed: true") == 2, final
    join_part = final.split("SortMergeJoin")[1]
    # the only legal exchange is ABOVE the join (the final groupBy,
    # which prints BEFORE the join in tree order); below the join
    # there must be none — buckets are co-located
    assert "Exchange hashpartitioning" not in join_part, join_part
