"""S2: csv / json scans (SURVEY.md §2.B sources).

The fixtures ship as parquet only, so each query first materializes a
csv/json copy of the table (once per sf dir, cached under /tmp with
Spark's own ``_SUCCESS`` marker), then reads it back with an
**explicit schema** — inference is banned: at 100 TB a schema
inference pass is a full extra scan, and on streaming sources it is
impossible. The oracle reads the original parquet view, so the check
proves the text roundtrip is lossless under the declared schema.

Format coverage note: parquet (catalog), csv, json here, XML (s9 —
Spark 4's native reader), ORC in tests/test_sources, text loglines
(s8), and a custom Python DataSource (s7). Avro is NOT exercised: spark-avro is an external
module since Spark 2.4 and this container has no network to fetch it
(verified: ``format("avro")`` raises "Failed to find data source").
The csv/json pattern above (explicit schema, lossless-roundtrip
oracle) transfers to it unchanged once the jar is on the classpath.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from meepo_spark.catalog import table
from meepo_spark.registry import register

_CACHE_ROOT = os.path.join(tempfile.gettempdir(), "meepo_spark_s2")


def _materialize(df: DataFrame, sf_dir: str, name: str, fmt: str) -> str:
    """Write ``df`` as csv/json once per (sf dir, name); return path."""
    out = os.path.join(_CACHE_ROOT, os.path.basename(os.path.normpath(sf_dir)), f"{name}_{fmt}")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        writer = df.write.mode("overwrite")
        if fmt == "csv":
            writer = writer.option("header", "true")
        writer.format(fmt).save(out)
    return out


NATION_SCHEMA = T.StructType(
    [
        T.StructField("n_nationkey", T.LongType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.LongType()),
    ]
)

ORDERS_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.DateType()),
    ]
)


@register(
    "s2_csv_scan",
    oracle="""
    SELECT n_regionkey,
           COUNT(*)     AS n_nations,
           MIN(n_name)  AS first_name,
           MAX(n_name)  AS last_name
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
)
def s2_csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2a: csv source with header + explicit schema, FAILFAST so a
    malformed row is an error, never a silent null."""
    path = _materialize(table(spark, sf_dir, "nation"), sf_dir, "nation", "csv")
    nation = (
        spark.read.schema(NATION_SCHEMA)
        .option("header", "true")
        .option("mode", "FAILFAST")
        .csv(path)
    )
    return (
        nation.groupBy("n_regionkey")
        .agg(
            F.count("*").alias("n_nations"),
            F.min("n_name").alias("first_name"),
            F.max("n_name").alias("last_name"),
        )
        .orderBy("n_regionkey")
    )


@register(
    "s2b_json_scan",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*)                  AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price,
           STRFTIME(MIN(o_orderdate), '%Y-%m-%d') AS first_date
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def s2b_json_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2b: json-lines source with explicit schema (doubles round-trip
    losslessly; timestamps are written as dates to pin a portable text
    form)."""
    src = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.to_date("o_orderdate").alias("o_orderdate"),
    )
    path = _materialize(src, sf_dir, "orders", "json")
    orders = spark.read.schema(ORDERS_TEXT_SCHEMA).option("mode", "FAILFAST").json(path)
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_date"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "s7_python_datasource",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS total_value,
           STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
           STRFTIME(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
    FROM events
    GROUP BY event_type
    """,
)
def s7_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7: the custom Python DataSource as a graded scan — the events
    feed read through the `meepo_changelog` connector
    (sources/pyds.py: row-group-parallel pyarrow reads yielding Arrow
    batches), then a plain aggregation. The oracle runs against the
    same parquet via DuckDB, so the whole connector path — partition
    planning, Arrow batch transfer, ns→µs timestamp truncation — is
    hash-checked, not just smoke-tested.

    Decimal-exact value sums keep the double aggregation
    order-invariant; timestamps render as strings per FIXTURES.md."""
    from meepo_spark.sources.pyds import register_changelog_source

    register_changelog_source(spark)
    ev = (
        spark.read.format("meepo_changelog")
        .option("path", f"{sf_dir}/events.parquet")
        .load()
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 2
        ).alias("total_value"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
    )


@register(
    "s8_text_logline_scan",
    oracle="""
    SELECT event_type,
           COUNT(*)                                AS n_lines,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2)
               AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def s8_text_logline_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8: raw text-log ingestion — the schema-on-read shape for logs
    that never had a schema: events rendered as pipe-delimited lines,
    read back with ``spark.read.text`` (one ``value`` column, zero
    parsing cost at scan), then parsed with a single split + typed
    casts. The oracle aggregates the original table, so the check
    proves the render→parse roundtrip is lossless (values travel as
    integer cents — a printf'd double would not roundtrip).

    At 100 TB this is the first stage of every log pipeline: the text
    scan parallelizes by line ranges, the parse is map-side
    codegen'd, and bad lines would route to a rejects column instead
    of killing the scan (FAILFAST here, since the fixture is clean)."""
    e = table(spark, sf_dir, "events").select(
        F.concat_ws(
            "|",
            F.col("event_id"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
            F.col("user_id"),
            F.col("event_type"),
            F.round(F.col("value") * 100).cast("long"),
        ).alias("value")
    )
    path = _materialize(e, sf_dir, "events_log", "text")
    raw = spark.read.text(path)
    f = F.split(F.col("value"), "\\|")
    parsed = raw.select(
        f[0].cast("long").alias("event_id"),
        f[2].cast("long").alias("user_id"),
        f[3].alias("event_type"),
        f[4].cast("long").alias("cents"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("cents").cast("double") / 100.0, 2).alias("total_value"),
    )


SUPPLIER_XML_SCHEMA = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.LongType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)


@register(
    "s9_xml_scan",
    oracle="""
    SELECT s_nationkey,
           COUNT(*) AS n_suppliers,
           ROUND(SUM(s_acctbal), 2) AS total_bal,
           MIN(s_name) AS first_name
    FROM supplier
    GROUP BY s_nationkey
    ORDER BY s_nationkey
    """,
)
def s9_xml_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9: XML source — Spark 4's native XML reader (the spark-xml
    package folded into core), same discipline as s2: materialize the
    supplier table as XML once, read it back with an EXPLICIT schema
    and an explicit rowTag, aggregate; the oracle reads the original
    parquet, so the hash match proves the XML roundtrip is lossless
    under the declared schema (Java's shortest-roundtrip double
    formatting makes s_acctbal exact). Schema inference is banned for
    the same reason as csv/json: on 100 TB it is a full extra scan.
    """
    sup = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    out = os.path.join(
        _CACHE_ROOT, os.path.basename(os.path.normpath(sf_dir)), "supplier_xml"
    )
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        (
            sup.write.mode("overwrite")
            .format("xml")
            .option("rootTag", "suppliers")
            .option("rowTag", "supplier")
            .save(out)
        )
    back = (
        spark.read.schema(SUPPLIER_XML_SCHEMA)
        .format("xml")
        .option("rowTag", "supplier")
        .load(out)
    )
    return (
        back.groupBy("s_nationkey")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
            F.min("s_name").alias("first_name"),
        )
        .orderBy("s_nationkey")
    )


@register(
    "s10_partitioned_sink_roundtrip",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def s10_partitioned_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10: the partitioned parquet SINK graded through the oracle
    gate — every other S-row reads; this one WRITES the events table
    partitioned by event_type (the layout a 100 TB event lake uses so
    type-scoped consumers never scan other types), reads it back with
    a partition predicate, and aggregates. The oracle computes the
    same answer from the SOURCE table, so the hash match proves the
    write→read cycle is lossless (values, timestamps, nulls) AND the
    partition filter selected exactly the right rows.

    Scale shape: the read-back plan prunes at the DIRECTORY level —
    `event_type=purchase` appears under PartitionFilters, not as a
    row filter (asserted in tests/test_sources.py); at 100 TB that's
    the difference between listing one prefix and scanning the lake.
    The sink path is keyed on a hash of the ABSOLUTE fixture dir (not
    just its basename) under the system tmp dir, mode('overwrite'), so
    repeated runs (bench min-of-N, selfcheck) replace rather than
    leak, and two different roots that share a basename can never
    silently share a sink. Timestamps round-trip
    parquet µs exactly; the day cast happens AFTER read-back."""
    src = table(spark, sf_dir, "events")
    abs_sf = os.path.abspath(os.path.normpath(sf_dir))
    sf_id = hashlib.sha1(abs_sf.encode("utf-8")).hexdigest()[:12]
    dest = os.path.join(
        tempfile.gettempdir(),
        "meepo_spark_s10",
        f"{os.path.basename(abs_sf)}-{sf_id}",
    )
    (
        src.write.mode("overwrite")
        .partitionBy("event_type")
        .parquet(dest)
    )
    back = spark.read.parquet(dest).filter(
        F.col("event_type") == "purchase"
    )
    return back.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias(
            "cents"
        ),
    )


@register(
    "s11_bucketed_smb_join",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def s11_bucketed_smb_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11: BUCKETED-table layout graded through the oracle gate —
    orders and customer are written as managed tables bucketed 8 ways
    on the join key (bucketBy + sortBy + saveAsTable), read back, and
    joined bucket-to-bucket. The oracle computes the same join from
    the SOURCE parquet, so the hash match proves the bucketed write →
    catalog read → join cycle is lossless AND bucket-aligned (a row
    hashed into the wrong bucket never meets its match and the counts
    break).

    Scale shape: bucketing is THE shuffle amortizer at 100 TB — both
    sides pre-partitioned and pre-sorted on the key means every
    subsequent co-keyed join/aggregate is exchange-free (sort-merge
    on co-located buckets); one write-time shuffle is paid once and
    reused by every downstream query. The exchange-free plan is
    asserted in tests/test_sources.py (broadcast disabled, both scans
    feed the SortMergeJoin with no ShuffleExchange). Table names are
    keyed on a hash of the absolute fixture dir (the s10 collision
    discipline); mode('overwrite') keeps re-runs idempotent."""
    import shutil

    abs_sf = os.path.abspath(os.path.normpath(sf_dir))
    sf_id = hashlib.sha1(abs_sf.encode("utf-8")).hexdigest()[:12]
    t_o, t_c = f"s11_orders_{sf_id}", f"s11_customer_{sf_id}"
    # a managed table's LOCATION outlives the in-memory catalog (the
    # session that wrote it is gone, the warehouse dir is not), and
    # Spark refuses to re-create a managed table over a leftover
    # location — drop both the catalog entry and any stale dir first.
    # Names are fully qualified into `default` so the managed location
    # is <warehouse>/<name> regardless of the session's current
    # database, and the warehouse conf is parsed as a URI (handles
    # bare paths, file:/p, file:///p, file://host/p alike) instead of
    # a literal 'file:' strip; a non-local warehouse scheme skips the
    # local sweep (DROP TABLE is then the whole cleanup).
    from urllib.parse import unquote, urlparse

    t_o, t_c = f"default.{t_o}", f"default.{t_c}"
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
    wh_path = unquote(wh.path) if wh.scheme in ("", "file") else None
    for name in (t_o, t_c):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        if wh_path:
            loc = os.path.join(wh_path, name.split(".", 1)[1])
            if os.path.isdir(loc):
                shutil.rmtree(loc, ignore_errors=True)
    (
        table(spark, sf_dir, "orders")
        .write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable(t_o)
    )
    (
        table(spark, sf_dir, "customer")
        .write.mode("overwrite")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .saveAsTable(t_c)
    )
    o = spark.table(t_o)
    c = spark.table(t_c)
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
    )
