"""Semi-structured function families: arrays (F5), maps (F6), JSON
(F7) — the column shapes the ChangeEvent type and the LLM-pipeline
fixtures rely on (SURVEY.md §2.B)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meepo_spark.catalog import table
from meepo_spark.registry import register


@register(
    "f5_array_funcs",
    oracle="""
    SELECT doc_id,
           CAST(LEN(string_split(text, ' ')) AS INT)                      AS n_tokens,
           ARRAY_TO_STRING(string_split(text, ' ')[1:3], ' ')             AS first3,
           LIST_CONTAINS(string_split(text, ' '), 'data')                 AS has_data,
           CAST(LEN(LIST_FILTER(string_split(text, ' '), x -> LENGTH(x) > 5)) AS INT) AS n_long,
           CAST(LIST_AGGREGATE(LIST_TRANSFORM(string_split(text, ' '),
                                              x -> LENGTH(x)), 'sum') AS BIGINT)      AS sum_token_len
    FROM documents
    WHERE doc_id < 100
    """,
)
def f5_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: split/size/slice/array_contains plus the three array
    lambdas (transform / filter / aggregate) — all JVM-side
    higher-order functions, no Python in the loop."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("first3"),
        F.array_contains(toks, "data").alias("has_data"),
        F.size(F.filter(toks, lambda x: F.length(x) > 5)).alias("n_long"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sum_token_len"),
    )


@register(
    "f6_map_funcs",
    oracle="""
    SELECT event_id,
           ARRAY_TO_STRING(map_keys(MAP{'type': event_type, 'uid': CAST(user_id AS VARCHAR)}), ',') AS key_list,
           MAP{'type': event_type, 'uid': CAST(user_id AS VARCHAR)}['type'][1]                      AS type_val,
           CAST(CARDINALITY(MAP{'type': event_type, 'uid': CAST(user_id AS VARCHAR)}) AS INT)       AS n_keys
    FROM events
    WHERE event_id < 200
    """,
)
def f6_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: map construction / key enumeration / element access — the
    access pattern for ChangeEvent's ``row MAP<STRING,STRING>`` column
    (meepo's raw-event payload, SURVEY.md §1.3)."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("uid"), F.col("user_id").cast("string")
    )
    return ev.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("key_list"),
        F.element_at(m, "type").alias("type_val"),
        F.size(m).alias("n_keys"),
    )


@register(
    "f7_json_funcs",
    oracle="""
    SELECT event_type,
           COUNT(*)                                                        AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           MIN(json_extract_string(props, '$.k'))                          AS min_k_str
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY event_type
    """,
)
def f7_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: JSON string extraction + typed aggregation over the
    events.props payload (the schemaless tail meepo events carry)."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return (
        ev.filter(k.isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k.cast("int")).cast("long").alias("sum_k"),
            F.min(k).alias("min_k_str"),
        )
    )


@register(
    "f8_variant_payload",
    oracle="""
    SELECT CAST(CAST(json_extract_string(props, '$.k') AS INT) // 10 AS INT) AS k_bucket,
           COUNT(*) AS n,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k,
           CAST(COUNT(json_extract_string(props, '$.missing')) AS BIGINT) AS n_missing_path
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY 1
    """,
)
def f8_variant_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7/F8: the VARIANT path through the same schemaless payload f7
    reads as strings — `parse_json` once into Spark 4's binary
    semi-structured encoding, then typed `variant_get` extraction and
    null-safe `try_variant_get` probing of absent paths.

    Why it matters at 100 TB: a payload parsed to VARIANT at ingest is
    parsed ONCE — every downstream extraction is a binary field probe,
    not a JSON re-parse per expression the way repeated
    get_json_object calls are. The oracle extracts the same fields
    from the raw JSON text, proving the two encodings agree."""
    ev = table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "int")
    missing = F.try_variant_get(v, "$.missing", "string")
    return (
        ev.select(
            k.alias("k"),
            F.col("event_type"),
            missing.alias("missing"),
        )
        .filter(F.col("k").isNotNull())
        .groupBy(F.floor(F.col("k") / 10).cast("int").alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("event_type").alias("n_types"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count("missing").alias("n_missing_path"),
        )
    )


@register(
    "f9_try_functions",
    oracle="""
    WITH t AS (
        SELECT event_type, user_id, value,
               CASE WHEN user_id % 2 = 0 THEN CAST(user_id AS VARCHAR)
                    ELSE event_type END AS mixed,
               CASE WHEN user_id % 5 = 0 THEN NULL
                    ELSE CAST(value AS DECIMAL(18,6)) / (user_id % 5) END AS safe_div
        FROM events
    )
    SELECT event_type,
           COUNT(*) AS n,
           CAST(COUNT(*) - COUNT(TRY_CAST(mixed AS INT)) AS BIGINT)  AS n_cast_null,
           CAST(SUM(TRY_CAST(mixed AS INT)) AS BIGINT)               AS sum_cast_ok,
           CAST(COUNT(*) - COUNT(safe_div) AS BIGINT)                AS n_div_null,
           ROUND(CAST(SUM(safe_div) AS DOUBLE) + 1e-9, 2)            AS sum_safe_div
    FROM t
    GROUP BY event_type
    """,
)
def f9_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: the try_* error-safe function family under ANSI SQL mode —
    `try_cast` turns unparseable strings into nulls instead of
    failing the job, `try_divide` turns zero-divisor decimal division
    into null instead of an ANSI error. The bulk-ingest posture: at
    100 TB one malformed row must cost a null, not a stage retry
    storm. The oracle mirrors the semantics with CASE guards, so the
    null-accounting (not just the happy path) is hash-checked."""
    ev = table(spark, sf_dir, "events")
    mixed = F.when(
        F.col("user_id") % 2 == 0, F.col("user_id").cast("string")
    ).otherwise(F.col("event_type"))
    safe_div = F.try_divide(
        F.col("value").cast("decimal(18,6)"), F.col("user_id") % 5
    )
    t = ev.select(
        "event_type",
        mixed.try_cast("int").alias("cast_ok"),
        safe_div.alias("safe_div"),
    )
    return t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) - F.count("cast_ok")).alias("n_cast_null"),
        F.sum("cast_ok").cast("long").alias("sum_cast_ok"),
        (F.count(F.lit(1)) - F.count("safe_div")).alias("n_div_null"),
        F.round(F.sum("safe_div").cast("double") + 1e-9, 2).alias("sum_safe_div"),
    )


@register(
    "f10_url_parse",
    oracle="""
    WITH u AS (
        SELECT 'https://' || source || '.example.com/docs/' || doc_id
               || '?lang=' || lang || '&v=2' AS url
        FROM documents
    )
    SELECT regexp_extract(url, 'https?://([^/?#]+)', 1) AS host,
           regexp_extract(url, '[?&]lang=([^&]*)', 1)   AS lang_param,
           CAST(COUNT(*) AS BIGINT)                     AS n_docs,
           MIN(regexp_extract(url, '://[^/]+(/[^?#]*)', 1)) AS first_path
    FROM u
    GROUP BY 1, 2
    """,
)
def f10_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10: URL function family — host / path / query-parameter
    extraction with `parse_url`, the workhorse of web-crawl curation
    (per-domain quotas, TLD filters, tracking-param stripping). The
    fixture has no URL column, so one is synthesized deterministically
    from (source, doc_id, lang) first — the parsing underneath is the
    real surface. The DuckDB oracle parses with regexes, proving the
    semantics rather than echoing the same builtin.

    Per-domain grouping is the scale story: crawl curation shuffles
    on host (bounded cardinality), never on raw URL."""
    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"),
        F.lit("&v=2"),
    )
    u = d.select(url.alias("url"))
    return u.groupBy(
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min(F.parse_url(F.col("url"), F.lit("PATH"))).alias("first_path"),
    )


@register(
    "f5b_hof_family",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
           len(list_filter(embedding, x -> x > 0.25)) > 0 AS any_hot,
           len(list_filter(embedding, x -> NOT (x > -1.0))) = 0 AS all_gt_neg1,
           ROUND(list_sum(list_transform(embedding,
                          x -> abs(CAST(x AS DOUBLE)))) + 1e-9, 2) AS l1,
           ROUND(CAST(embedding[1] AS DOUBLE)
                 + CAST(embedding[64] AS DOUBLE) + 1e-9, 4) AS ends_sum
    FROM embeddings
    """,
)
def f5b_hof_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5b: higher-order array functions — exists / forall / filter /
    aggregate lambdas over the embedding vectors, plus element_at
    indexing. These are the JVM-side lane for array math: every
    lambda is codegen'd per element, so a 64-float fold costs no
    Python round-trip at all (contrast l3d's Arrow UDF, which pays
    one batch hop and is reserved for matmul-shaped work).

    Floats are cast to DOUBLE before folding on BOTH engines — a
    float32 accumulator would drift ~1e-4 relative and no rounding
    convention could hide it; double accumulation agrees to ~1e-14
    and 2dp rounding absorbs that."""
    e = table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_pos"),
        F.exists(emb, lambda x: x > 0.25).alias("any_hot"),
        F.forall(emb, lambda x: x > -1.0).alias("all_gt_neg1"),
        F.round(
            F.aggregate(
                emb,
                F.lit(0.0),
                lambda acc, x: acc + F.abs(x.cast("double")),
            )
            + 1e-9,
            2,
        ).alias("l1"),
        F.round(
            F.element_at(emb, 1).cast("double")
            + F.element_at(emb, 64).cast("double")
            + 1e-9,
            4,
        ).alias("ends_sum"),
    )


@register(
    "f13_bitwise_funcs",
    oracle="""
    SELECT l_linenumber,
           CAST(BIT_AND(CAST(l_quantity AS BIGINT)) AS BIGINT)  AS qty_and,
           CAST(BIT_OR(CAST(l_quantity AS BIGINT)) AS BIGINT)   AS qty_or,
           CAST(BIT_XOR(CAST(l_quantity AS BIGINT)) AS BIGINT)  AS qty_xor,
           CAST(SUM(CAST(l_quantity AS BIGINT) << 2) AS BIGINT) AS qty_shl2,
           CAST(SUM(bit_count(CAST(l_orderkey AS BIGINT))) AS BIGINT) AS popcount_sum
    FROM lineitem
    GROUP BY l_linenumber
    """,
)
def f13_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13: bitwise surface — the aggregate forms (bit_and/or/xor)
    plus shifts and popcount. Bitmask aggregation is how flag sets,
    bloom-filter words, and permission vectors are folded at scale:
    integer-exact, order-independent, map-side combinable (g8 builds
    the event bitmask on top of exactly these)."""
    l = table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    return l.groupBy("l_linenumber").agg(
        F.bit_and(q).alias("qty_and"),
        F.bit_or(q).alias("qty_or"),
        F.bit_xor(q).alias("qty_xor"),
        F.sum(F.shiftleft(q, 2).cast("long")).alias("qty_shl2"),
        F.sum(F.bit_count(F.col("l_orderkey").cast("long"))).alias("popcount_sum"),
    )


@register(
    "f14_datetime_construction",
    oracle="""
    WITH parts AS (
        SELECT EXTRACT(year FROM o_orderdate)  AS y,
               EXTRACT(month FROM o_orderdate) AS m,
               EXTRACT(day FROM o_orderdate)   AS d,
               o_totalprice
        FROM orders
    )
    SELECT STRFTIME(make_date(CAST(y AS INT), CAST(m AS INT), 1), '%Y-%m-%d')
               AS month_start,
           STRFTIME(make_timestamp(CAST(y AS INT), CAST(m AS INT), CAST(d AS INT),
                                   12, 0, 0.0), '%Y-%m-%d %H:%M:%S')
               AS noon_ts_sample,
           COUNT(*)                        AS n_orders,
           ROUND(SUM(o_totalprice), 2)     AS total_price
    FROM parts
    GROUP BY 1, 2
    """,
)
def f14_datetime_construction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14: date/timestamp CONSTRUCTION from parts (make_date /
    make_timestamp) — the inverse of F2's extraction family, needed
    whenever calendar keys arrive as separate columns (CSV exports,
    partitioning schemes). Deconstruct each order date and rebuild
    both a month-start date and a noon timestamp; the group-by proves
    the rebuilt values are lossless keys."""
    o = table(spark, sf_dir, "orders")
    parts = o.select(
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        "o_totalprice",
    )
    return (
        parts.groupBy(
            F.date_format(
                F.make_date(F.col("y"), F.col("m"), F.lit(1)), "yyyy-MM-dd"
            ).alias("month_start"),
            F.date_format(
                F.make_timestamp(
                    F.col("y"), F.col("m"), F.col("d"),
                    F.lit(12), F.lit(0), F.lit(0.0),
                ),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("noon_ts_sample"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )

@register(
    "f17_map_hof",
    # The oracle is the RELATIONAL formulation (GROUP BY + HAVING +
    # arithmetic) of what the engine computes through map HOFs —
    # a cross-check of the functions, not a re-implementation.
    oracle="""
    SELECT user_id, event_type,
           CAST(POWER(COUNT(*), 2) AS BIGINT) AS sq_count
    FROM events
    GROUP BY user_id, event_type
    HAVING COUNT(*) >= 3
    """,
)
def f17_map_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17: map higher-order functions — each user's per-type event
    census built AS A MAP (map_from_entries), thresholded with
    map_filter, squared with transform_values, and exploded back to
    rows. The map-shaped feature-store idiom (one row per entity, a
    map column of per-key stats) exercised end to end; the oracle is
    the equivalent relational aggregate, so the hash match proves the
    HOF pipeline preserves exactly the relational semantics.

    Scale shape: one (user, type) hash aggregate (map-side combine),
    then per-user maps of <= |event types| = 5 entries — the map ops
    are narrow projections in codegen; the final explode restores
    row grain without a shuffle."""
    e = table(spark, sf_dir, "events")
    per = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    maps = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    transformed = maps.select(
        "user_id",
        F.transform_values(
            F.map_filter(F.col("m"), lambda k, v: v >= 3),
            lambda k, v: v * v,
        ).alias("sq"),
    )
    return transformed.select(
        "user_id", F.explode("sq").alias("event_type", "sq_count")
    ).select("user_id", "event_type", F.col("sq_count").cast("long").alias("sq_count"))
