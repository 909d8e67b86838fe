"""Explicit StructTypes for every fixture table (FIXTURES.md, verified
against /root/testdata parquet) plus the engine's canonical ChangeEvent
type — the Spark-native replacement for meepo's ``{table}_{action}``
blinker signals (ref: meepo/signals.py, meepo/pub/mysql.py; module-path
citations per SURVEY.md §0).

Streaming sources must declare a schema; batch reads use these to avoid
inference drift between scale factors.
"""

from __future__ import annotations

from pyspark.sql import types as T

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

FIXTURE_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# The engine's core type: one row per observed database row-change.
# Replaces meepo's `{table}_{action}` signal (payload = pk) and the
# `_raw` variants (payload = full row dict).  `offset` is the binlog
# position surrogate (monotone per source); `txn_id` carries the
# prepare/commit envelope of meepo/apps/eventsourcing (SURVEY.md §1.3).
CHANGE_EVENT = T.StructType(
    [
        T.StructField("schema_name", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("action", T.StringType()),  # 'write'|'update'|'delete'
        T.StructField("pk", T.StringType()),
        T.StructField("row", T.MapType(T.StringType(), T.StringType())),
        T.StructField("old_row", T.MapType(T.StringType(), T.StringType())),
        T.StructField("ts", T.TimestampType()),
        T.StructField("offset", T.LongType()),
        T.StructField("txn_id", T.StringType()),
    ]
)

CHANGE_ACTIONS = ("write", "update", "delete")

# --- Payload schema registry (VERDICT r5 #4) ------------------------
# The versioned typed-STRUCT schemas for the `users` change payload —
# the registry step that turns the stringly MAP row images into
# analyzable columns (cdc/events.typed_changes). CONTRACT: versions
# are ADDITIVE — a new version only appends fields — so any two typed
# lanes re-merge with unionByName(allowMissingColumns=True) and the
# max version's struct is the superset every consumer can read.
USER_PAYLOAD_V1 = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("last_event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)
USER_PAYLOAD_V2 = T.StructType(
    USER_PAYLOAD_V1.fields + [T.StructField("source_offset", T.LongType())]
)
PAYLOAD_REGISTRY: dict[int, T.StructType] = {1: USER_PAYLOAD_V1, 2: USER_PAYLOAD_V2}
