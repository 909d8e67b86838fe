"""Fixture catalog: load a scale-factor directory into DataFrames and
temp views.

At 100 TB these reads become partitioned table scans; expressing every
query against the returned DataFrames (rather than collected data) is
what lets Catalyst push filters/projections into the parquet scan and
prune partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# table name -> sf_dir it was registered+ANALYZEd at (see enable_cbo)
_CBO_TABLES: dict[str, str] = {}


def enable_cbo(spark: SparkSession, sf_dir: str, histograms: bool = False) -> list[str]:
    """Register the fixture parquet files as EXTERNAL catalog tables
    under the ``cbo`` database, ANALYZE them (row counts + per-column
    min/max/ndv; equi-depth histograms when ``histograms``), and turn
    on cost-based optimization + stats-driven join reordering.

    Path reads carry only file-size estimates, so Catalyst's join
    reordering and broadcast decisions fly blind on selectivity; with
    ANALYZEd catalog tables the optimizer sees real row counts and
    filtered cardinalities — at 100 TB that is the difference between
    broadcasting a filtered dimension and shuffling the fact. After
    this call, ``table()`` transparently serves ``cbo.<name>`` for the
    same ``sf_dir``, so every registered query runs stats-backed.
    Gate for the bench path: SPARK_GRAFT_CBO=1 (see bench.py).

    ``events`` is excluded: its ts column needs the nanos
    normalization in ``table()``, which a catalog table would bypass.
    """
    spark.sql("CREATE DATABASE IF NOT EXISTS cbo")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    if histograms:
        spark.conf.set("spark.sql.statistics.histogram.enabled", "true")
    analyzed: list[str] = []
    for name in TABLES:
        if name == "events":
            continue
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        spark.sql(f"DROP TABLE IF EXISTS cbo.{name}")
        spark.sql(f"CREATE TABLE cbo.{name} USING parquet LOCATION '{path}'")
        # column stats only for atomic types — ANALYZE FOR COLUMNS
        # rejects array/map/struct (e.g. embeddings.embedding).
        # timestamp_ntz is excluded too: Spark 4.1's FilterEstimation
        # MatchErrors on TimestampNTZType when the column HAS stats
        # (filters on it then fall back to default selectivity
        # instead of crashing the whole query under CBO).
        atomic = [
            f.name
            for f in spark.table(f"cbo.{name}").schema.fields
            if f.dataType.typeName()
            not in ("array", "map", "struct", "binary", "variant", "timestamp_ntz")
        ]
        if atomic:
            spark.sql(
                f"ANALYZE TABLE cbo.{name} COMPUTE STATISTICS "
                f"FOR COLUMNS {', '.join(atomic)}"
            )
        else:
            spark.sql(f"ANALYZE TABLE cbo.{name} COMPUTE STATISTICS")
        _CBO_TABLES[name] = sf_dir
        analyzed.append(name)
    return analyzed


def disable_cbo(spark: SparkSession) -> None:
    """Undo ``enable_cbo``: CBO confs off, table() back to path reads."""
    spark.conf.set("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    spark.conf.set("spark.sql.statistics.histogram.enabled", "false")
    _CBO_TABLES.clear()


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, register_views: bool = True
) -> dict[str, DataFrame]:
    """Read every fixture table under ``sf_dir``; optionally register
    each as a temp view (so ``spark.sql`` and the DataFrame API share
    one catalog)."""
    dfs: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = table(spark, sf_dir, name)
        dfs[name] = df
        if register_views:
            df.createOrReplaceTempView(name)
    return dfs


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition to the session's shuffle parallelism before a
    CPU-heavy kernel (hashing, vector math). Small parquet files
    arrive as ONE scan partition (maxPartitionBytes splits by bytes,
    not by compute cost), which would serialize the kernel on a
    single core; the shuffle this inserts is tiny relative to the
    kernel. The partition count is EXPLICIT so AQE's byte-based
    coalescing cannot fold the tiny-but-CPU-heavy partitions back to
    one. At production scale the scan already yields many partitions
    and this becomes a cheap even-out against skew."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(n, *[F.col(c) for c in cols]) if cols else df.repartition(n)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table (no view registration).

    ``events.ts`` has shipped as TIMESTAMP(NANOS) in some fixture
    generations (which Spark's reader rejects outright — read as raw
    nanos via the legacy conf and convert with exact integer division;
    a double roundtrip would lose precision) and as TIMESTAMP(MICROS)
    NTZ in others. Normalize both to a session-TZ TIMESTAMP so every
    downstream query and oracle comparison sees one type.
    """
    # the driver grades queries on ITS session — pin the conventions
    # every oracle comparison depends on, whatever session we're given
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType.typeName()
        if ts_type == "long":  # nanos-as-long fixture generation
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_type == "timestamp_ntz":
            # session TZ is pinned UTC above, so this is value-identity
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    if _CBO_TABLES.get(name) == sf_dir:
        return spark.table(f"cbo.{name}")
    return spark.read.parquet(path)
