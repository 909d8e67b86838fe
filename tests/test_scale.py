"""Scale-mechanism tests (SURVEY.md §4.4): skew salting and bucketed
co-located joins — the two shuffle-shaping tools the 100 TB posture
relies on beyond AQE."""

from __future__ import annotations

import pyspark.sql.functions as F

from meepo_spark.catalog import table
from meepo_spark.operators.joins import salted_join

from conftest import SF_DIR


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_salted_join_equals_plain_join(spark):
    """Salting must be result-transparent: same rows as the plain
    join on a deliberately skewed input (90% of fact rows on one
    key)."""
    skewed = (
        table(spark, SF_DIR, "lineitem")
        .withColumn(
            "k", F.when(F.col("l_linenumber") > 1, F.lit(0)).otherwise(F.col("l_orderkey"))
        )
        .select("k", "l_quantity")
    )
    dim = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    plain = skewed.join(dim, "k").groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("sv")
    )
    salted = salted_join(skewed, dim, "k").groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("sv")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    """Left-salted rows with no dim match must survive exactly once."""
    big = spark.range(0, 1000).select((F.col("id") % 10).alias("k"), "id")
    dim = spark.range(0, 5).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    plain = big.join(dim, "k", "left")
    salted = salted_join(big, dim, "k", how="left")
    assert plain.count() == salted.count() == 1000
    assert salted.filter(F.col("v").isNull()).count() == 500


def test_bucketed_join_has_no_shuffle(spark):
    """Bucketed tables co-locate join keys at WRITE time; a fact-fact
    join on the bucket key — and even the following agg on that key —
    must then plan with ZERO Exchange nodes. At 100 TB this converts
    the recurring fact-fact shuffle into a one-time layout cost.
    Auto-broadcast is disabled so the test exercises the sort-merge
    path (a broadcast would trivially avoid the shuffle)."""
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("li_bucketed", "o_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    lineitem = table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    orders = table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(
        "li_bucketed"
    )
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(
        "o_bucketed"
    )
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table("li_bucketed")
            .join(
                spark.table("o_bucketed"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        plan = plan_of(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert "SelectedBucketsCount" in plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        for t in ("li_bucketed", "o_bucketed"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_publish_partitioned_dataset(spark, tmp_path):
    """Publishing the curated corpus: partition by lang, shard within
    each partition by hashed doc_id so file count (and therefore file
    size) is explicit — `repartition(N, keys)` before a partitionBy
    write is what prevents the small-files problem at 100 TB (one
    task's output per partition-dir × shard). Readers must then prune:
    a lang='en' query may scan only the en/ directory."""
    d = table(spark, SF_DIR, "documents")
    out = str(tmp_path / "curated")
    shards = 4
    (
        d.repartition(shards, F.col("lang"), F.pmod(F.xxhash64("doc_id"), F.lit(shards)))
        .write.partitionBy("lang")
        .parquet(out)
    )

    back = spark.read.parquet(out)
    assert back.count() == d.count()

    import glob
    import os

    langs = sorted(
        os.path.basename(p).split("=")[1] for p in glob.glob(f"{out}/lang=*")
    )
    assert langs == sorted(r.lang for r in d.select("lang").distinct().collect())
    for p in glob.glob(f"{out}/lang=*"):
        n_files = len(glob.glob(f"{p}/*.parquet"))
        assert 1 <= n_files <= shards, f"{p}: {n_files} files"

    pruned = back.filter(F.col("lang") == langs[0])
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan, plan
    assert pruned.count() == d.filter(F.col("lang") == langs[0]).count()


def test_schema_evolution_merge_read(spark, tmp_path):
    """Ingest across a schema change: day-1 files lack a column day-2
    files carry. `mergeSchema` reconciles the union schema with nulls
    for the missing column — the append-only evolution discipline a
    long-lived 100 TB dataset needs (column ADDS are safe; renames/
    retypes are not and FAILFAST ingest catches them upstream)."""
    base = str(tmp_path / "evolving")
    spark.range(5).selectExpr("id", "id * 2 AS v1").write.parquet(f"{base}/day=1")
    spark.range(5, 8).selectExpr(
        "id", "id * 2 AS v1", "CAST(id AS STRING) AS v2_added"
    ).write.parquet(f"{base}/day=2")

    merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(merged.columns) == {"id", "v1", "v2_added", "day"}
    assert merged.count() == 8
    old_rows = merged.filter("day = 1")
    assert old_rows.filter(F.col("v2_added").isNull()).count() == 5
    new_rows = merged.filter("day = 2").select("id", "v2_added").collect()
    assert {(r.id, r.v2_added) for r in new_rows} == {(i, str(i)) for i in range(5, 8)}


def test_aqe_splits_skewed_join(spark, tmp_path):
    """AQE skew-join handling, proven not assumed: build a join where
    one key owns ~95% of the left side, drop the skew thresholds to
    fixture scale, and assert the adaptive plan actually marked the
    sort-merge join skew=true (split the hot partition). This is the
    runtime safety net behind the salted_join operator — salting is
    for known-hot keys, AQE catches the ones you didn't predict."""
    skew_conf = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "100KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    saved = {k: spark.conf.get(k, None) for k in skew_conf}
    for k, v in skew_conf.items():
        spark.conf.set(k, v)
    try:
        # 95% of the left lands on k=0 — the hot partition dwarfs the
        # median, which is what the skew detector keys on. The pad must
        # be INCOMPRESSIBLE (per-row sha2, not a repeated constant):
        # skew stats read compressed shuffle-block sizes, and a
        # constant pad compresses the hot partition below any threshold
        left = spark.range(60_000).selectExpr(
            "CASE WHEN id % 20 != 0 THEN 0 ELSE id END AS k",
            "sha2(cast(id as string), 256) AS pad",
        )
        right = spark.range(500).selectExpr("id AS k", "id * 10 AS v")
        joined = left.join(right, "k")
        n = len(joined.collect())  # execute THIS DataFrame so AQE finalizes its plan
        # matches: 57001 rows of k=0 (non-multiples of 20, plus id=0
        # itself), plus the multiples of 20 among 20..480
        assert n == 57_001 + sum(1 for i in range(1, 500) if i % 20 == 0)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_prunes_join_probe(spark, tmp_path):
    """Runtime-filter injection: when one join side is heavily
    filtered, Spark can inject a bloom filter built from that side
    into the OTHER side's scan, so probe rows that cannot match die
    at the scan instead of riding the shuffle. At 100 TB this is the
    difference between shuffling the whole fact table and shuffling
    the ~1% that survives the dimension filter — the same reason the
    reference filters events at the binlog source rather than in
    subscribers.

    Parquet fixtures are small enough that Spark's size thresholds
    would normally skip injection, so thresholds are dropped to make
    the behavior observable; the assertion is on plan structure, not
    timing."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "1GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled": "false",
        # force a shuffle join so there is a probe side worth pruning
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = table(spark, SF_DIR, "lineitem")
        orders = table(spark, SF_DIR, "orders").filter(
            F.col("o_totalprice") > 450000
        )
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
            "l_orderkey", "l_extendedprice", "o_totalprice"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter" in plan.lower() or "BloomFilter" in plan, plan[:2000]
        # and the filtered result is still correct
        n_joined = joined.count()
        n_expected = (
            table(spark, SF_DIR, "lineitem")
            .join(
                table(spark, SF_DIR, "orders").filter(
                    F.col("o_totalprice") > 450000
                ),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert n_joined == n_expected and n_joined > 0
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_zorder_layout_prunes_both_columns(spark, tmp_path):
    """Z-order clustering vs single-column sort, judged by the same
    parquet footer min/max stats a reader uses for file skipping.
    Sorted-by-partkey files prune partkey predicates but are blind on
    suppkey; the Morton layout must prune a mid-range predicate on
    BOTH columns. Uses (l_partkey, l_suppkey), which are uncorrelated
    in the fixture — the honest (hard) case for multi-dim layout."""
    import pyarrow.parquet as pq

    from meepo_spark.operators.layout import zorder_write

    li = table(spark, SF_DIR, "lineitem").select("l_partkey", "l_suppkey")
    plain_dir, z_dir = str(tmp_path / "plain"), str(tmp_path / "zorder")
    (
        li.repartitionByRange(8, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(plain_dir)
    )
    zorder_write(li, ("l_partkey", "l_suppkey"), z_dir, files=8)

    def file_ranges(d, col):
        out = []
        import os

        for f in sorted(os.listdir(d)):
            if not f.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(d, f))
            los, his = [], []
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        los.append(c.statistics.min)
                        his.append(c.statistics.max)
            if los:
                out.append((min(los), max(his)))
        return out

    def pruned(ranges, lo, hi):
        return sum(1 for a, b in ranges if b < lo or a > hi)

    # mid-range probes ~20% wide on each column, from the real domain
    b = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).first()
    # 10%-30% band: clear of the top-bit boundary (50%) that any
    # power-of-two space split puts in the middle of the domain
    pk_lo = b[0] + (b[1] - b[0]) * 1 // 10
    pk_hi = b[0] + (b[1] - b[0]) * 3 // 10
    sk_lo = b[2] + (b[3] - b[2]) * 1 // 10
    sk_hi = b[2] + (b[3] - b[2]) * 3 // 10
    plain_pk = pruned(file_ranges(plain_dir, "l_partkey"), pk_lo, pk_hi)
    plain_sk = pruned(file_ranges(plain_dir, "l_suppkey"), sk_lo, sk_hi)
    z_pk = pruned(file_ranges(z_dir, "l_partkey"), pk_lo, pk_hi)
    z_sk = pruned(file_ranges(z_dir, "l_suppkey"), sk_lo, sk_hi)

    assert plain_pk > 0          # single-col sort prunes its own column
    assert plain_sk == 0         # ...and is blind on the other
    assert z_pk > 0 and z_sk > 0  # z-order prunes BOTH


def test_dynamic_partition_pruning_on_partitioned_store(spark, tmp_path):
    """Dynamic partition pruning: joining a date-partitioned fact to a
    FILTERED dim turns the dim filter into a runtime partition filter
    on the fact scan — partitions for non-qualifying dates are never
    listed, let alone read. This is the partition-layout payoff of the
    event store's event_date scheme beyond static pruning: the probe
    values come from another table at RUNTIME, which a static filter
    cannot express. At 100 TB the difference is scanning 3 partitions
    instead of 3000."""
    fact_dir = str(tmp_path / "fact")
    ev = table(spark, SF_DIR, "events")
    (
        ev.withColumn("event_date", F.to_date("ts"))
        .write.partitionBy("event_date")
        .mode("overwrite")
        .parquet(fact_dir)
    )
    fact = spark.read.parquet(fact_dir)
    # a real dim table with a selective predicate — DPP keys off a
    # Filter on the build side, not a LIMIT
    dim = (
        ev.select(F.to_date("ts").alias("d"), F.col("event_type").alias("et"))
        .distinct()
        .filter(F.col("et") == "signup")
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    old = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    try:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true"
        )
        joined = fact.join(dim, fact.event_date == dim.d).select("event_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan[:1500]
        expected = (
            ev.withColumn("d", F.to_date("ts")).join(dim, "d").count()
        )
        assert joined.count() == expected and expected > 0
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", old
        )


def test_aqe_coalesces_small_shuffle_partitions(spark):
    """AQE partition coalescing: a shuffle planned at
    spark.sql.shuffle.partitions collapses to few partitions when the
    runtime byte sizes are tiny — the mechanism that makes one global
    shuffle-partition setting workable across 100 TB facts and KB
    dims in the same job (over-partitioned stages self-heal instead
    of paying per-task overhead 32×)."""
    li = table(spark, SF_DIR, "lineitem")
    agg = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("q"))
    agg.collect()  # materialize so AQE finalizes the adaptive plan
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in plan and "coalesced" in plan, plan[:1500]


def test_max_partition_bytes_controls_scan_parallelism(spark, tmp_path):
    """SCALE.md §1's file-size math, mechanically verified: the same
    parquet bytes yield few scan tasks under a large
    maxPartitionBytes and many under a small one — the reader splits
    files by byte ranges, so scan parallelism is a CONFIG decision,
    not a function of file count. At 100 TB this is what turns
    ~200-800k well-sized files into a task count matched to the
    executor fleet; uncompressed row-group-dense files split
    cleanly."""
    out = str(tmp_path / "one_file")
    (
        table(spark, SF_DIR, "lineitem")
        .coalesce(1)
        .write.mode("overwrite")
        .option("compression", "none")
        .option("parquet.block.size", 32 * 1024)  # many small row groups
        .parquet(out)
    )
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
        coarse = spark.read.parquet(out).rdd.getNumPartitions()
        spark.conf.set("spark.sql.files.maxPartitionBytes", "64k")
        fine = spark.read.parquet(out).rdd.getNumPartitions()
        assert coarse <= 2, coarse
        assert fine >= coarse * 4, (fine, coarse)
        # splitting never changes results
        assert spark.read.parquet(out).count() == table(
            spark, SF_DIR, "lineitem"
        ).count()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_compact_files_merges_fragments_losslessly(spark, tmp_path):
    """Small-file compaction: 40 fragment files rewrite into the
    byte-targeted count (here 1), row-for-row lossless. The
    maintenance job that keeps streaming-sink output scannable —
    SCALE.md §1's 128-512 MB file policy as running code."""
    from meepo_spark.operators.layout import compact_files

    frag_dir, out_dir = str(tmp_path / "frags"), str(tmp_path / "compacted")
    li = table(spark, SF_DIR, "lineitem")
    li.repartition(40).write.mode("overwrite").parquet(frag_dir)
    import os

    n_frag = sum(1 for f in os.listdir(frag_dir) if f.endswith(".parquet"))
    assert n_frag == 40
    n_out = compact_files(spark, frag_dir, out_dir)
    assert n_out == 1  # fixture bytes are far below one target file
    assert spark.read.parquet(out_dir).count() == li.count()
    assert (
        spark.read.parquet(out_dir)
        .exceptAll(spark.read.parquet(frag_dir))
        .count()
        == 0
    )


def test_partition_upsert_rewrites_only_touched_partitions(spark, tmp_path):
    """Copy-on-write upsert: overwriting with partitionOverwriteMode=
    dynamic must replace exactly the partitions present in the update
    batch — untouched partitions' data files stay byte-identical
    (same inode, same mtime), which is what bounds write
    amplification to O(touched) at a 100 TB store."""
    import glob
    import os

    from meepo_spark.operators.layout import upsert_by_partition

    base = str(tmp_path / "store")
    events = table(spark, SF_DIR, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    events.write.partitionBy("event_date").parquet(base)

    untouched_glob = os.path.join(base, "event_date=2024-01-02", "*.parquet")
    before = {
        p: (os.stat(p).st_ino, os.stat(p).st_mtime_ns)
        for p in glob.glob(untouched_glob)
    }
    assert before, "fixture must have a 2024-01-02 partition"

    updates = (
        events.filter(F.col("event_date") == "2024-01-05")
        .withColumn("value", F.col("value") * 2)
    )
    affected = upsert_by_partition(base, updates, "event_date")
    assert affected == ["2024-01-05"]

    after = {
        p: (os.stat(p).st_ino, os.stat(p).st_mtime_ns)
        for p in glob.glob(untouched_glob)
    }
    assert after == before, "untouched partition files were rewritten"

    # the touched partition carries the new values; total row count intact
    got = spark.read.parquet(base)
    n_all = events.count()
    assert got.count() == n_all
    doubled = got.filter(F.col("event_date") == "2024-01-05").agg(
        F.sum("value").alias("s")
    ).first()["s"]
    original = events.filter(F.col("event_date") == "2024-01-05").agg(
        F.sum(F.col("value") * 2).alias("s")
    ).first()["s"]
    assert abs(doubled - original) < 1e-6
