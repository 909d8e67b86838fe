"""ChangeEvent construction and ingest.

The engine ingests an already-captured change stream (capture itself —
binlog wire parsing — is out of scope per BASELINE.json). Batch and
streaming ingest share one schema (meepo_spark.schemas.CHANGE_EVENT)
and one set of transformations; `events_as_changes` adapts the
driver's `events` fixture into that shape so every parity operator is
exercisable (and oracle-checkable) on real fixture data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meepo_spark.catalog import table
from meepo_spark.schemas import CHANGE_EVENT

# Fixture event_type → CDC action. 'error' events model row deletion;
# signup is the initial write; everything else updates the row image.
ACTION_MAP = {
    "signup": "write",
    "view": "update",
    "click": "update",
    "purchase": "update",
    "error": "delete",
}


def events_as_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the events fixture into the canonical ChangeEvent shape:
    one user row per event, pk = user_id, full row image in `row`,
    event_id doubling as the monotone binlog offset."""
    ev = table(spark, sf_dir, "events")
    # exhaustive by contract: an event_type outside ACTION_MAP is an
    # UPDATE, not NULL — the parity oracles' CASE ... ELSE 'update'
    # (7 of them) and this mapping must agree by construction, or a
    # future sixth event_type would silently diverge the two layers
    # (NULL action fails every `action != 'delete'` filter engine-side
    # while the oracle keeps the row) — code-review r5d.
    action = F.coalesce(
        *[F.when(F.col("event_type") == k, F.lit(v)) for k, v in ACTION_MAP.items()],
        F.lit("update"),
    )
    return ev.select(
        F.lit("app").alias("schema_name"),
        F.lit("users").alias("table"),
        action.alias("action"),
        F.col("user_id").cast("string").alias("pk"),
        F.when(
            action != "delete",
            F.create_map(
                F.lit("user_id"), F.col("user_id").cast("string"),
                F.lit("last_event_type"), F.col("event_type"),
                F.lit("value"), F.col("value").cast("string"),
            ),
        ).alias("row"),
        F.lit(None).cast("map<string,string>").alias("old_row"),
        F.col("ts"),
        F.col("event_id").alias("offset"),
        F.concat(F.lit("txn-"), (F.col("event_id") / 10).cast("long").cast("string")).alias(
            "txn_id"
        ),
    )


def typed_changes(
    changes: DataFrame,
    payload_schema,
    src: str = "row",
    out: str = "row_t",
) -> DataFrame:
    """Promote an untyped ``MAP<STRING,STRING>`` payload column to a
    typed STRUCT lane (VERDICT r4 #4) — the schema-registry step that
    turns meepo's stringly row images into analyzable columns.

    Per registry field: ``row[name]`` extracted and ``try_cast`` to
    the declared type — JVM-side, ANSI-safe (a malformed value becomes
    NULL instead of failing the pipeline; the registry owner alerts on
    NULL-rate, not on crashed jobs). Drift contract matches a16's
    unionByName discipline: keys absent from the map → NULL fields
    (old producer, new schema); map keys absent from the schema are
    ignored (new producer, old consumer); a NULL map (deletes) → NULL
    struct. Typed lanes promoted under DIFFERENT registry versions
    re-merge with ``unionByName(allowMissingColumns=True)``, which
    null-fills missing NESTED struct fields by name — never positional
    mis-binds."""
    fields = [
        F.col(src).getItem(f.name).try_cast(f.dataType).alias(f.name)
        for f in payload_schema.fields
    ]
    return changes.withColumn(
        out, F.when(F.col(src).isNotNull(), F.struct(*fields))
    )


def read_change_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming ingest of captured change events (parquet dir; Kafka+
    Debezium JSON lands in the same schema in production). Explicit
    schema — streaming sources must declare one."""
    return spark.readStream.schema(CHANGE_EVENT).parquet(path)


def filter_tables(changes: DataFrame, tables: list[str]) -> DataFrame:
    """meepo mysql_pub's `tables=[...]` filter (A1): restrict the
    stream to named tables. A plain pushdown-able predicate."""
    return changes.filter(F.col("table").isin(tables))


def topic(changes: DataFrame) -> DataFrame:
    """meepo's signal name — `{table}_{action}` — as a column (A4
    routing key)."""
    return changes.withColumn("topic", F.concat_ws("_", "table", "action"))
