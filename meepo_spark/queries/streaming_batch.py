"""Graded window-aggregate queries (T2-T4) — the same
streaming/windows.py specs run in batch mode so the DuckDB oracle can
check them (stream/table duality: identical results by construction;
tests/test_streaming.py proves the streaming side equals the batch
side on chunked replays)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from meepo_spark.catalog import table
from meepo_spark.registry import register
from meepo_spark.streaming.windows import session_agg, sliding_agg, tumbling_agg


@register(
    "t2_tumbling_window",
    oracle="""
    SELECT STRFTIME(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S')                  AS w_start,
           STRFTIME(date_trunc('day', ts) + INTERVAL 1 DAY, '%Y-%m-%d %H:%M:%S') AS w_end,
           event_type,
           COUNT(*)                    AS n,
           ROUND(SUM(value), 2)        AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def t2_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2: daily tumbling window per event type. Tumbling windows are
    a pure groupBy key — partial aggregation map-side, one shuffle of
    |windows × types| rows."""
    return tumbling_agg(table(spark, sf_dir, "events"), size="1 day")


@register(
    "t3_sliding_window",
    oracle="""
    WITH slid AS (
        SELECT e.*, date_trunc('day', e.ts) - INTERVAL (k.k) DAY AS w_start
        FROM events e, (SELECT UNNEST([0, 1]) AS k) k
        WHERE e.ts >= date_trunc('day', e.ts) - INTERVAL (k.k) DAY
          AND e.ts <  date_trunc('day', e.ts) - INTERVAL (k.k) DAY + INTERVAL 2 DAY
    )
    SELECT STRFTIME(w_start, '%Y-%m-%d %H:%M:%S')                  AS w_start,
           STRFTIME(w_start + INTERVAL 2 DAY, '%Y-%m-%d %H:%M:%S') AS w_end,
           event_type,
           COUNT(*) AS n
    FROM slid
    GROUP BY 1, 2, 3
    """,
)
def t3_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3: 2-day windows sliding daily — each event expands to 2
    window keys (Spark's Expand), then the same one-shuffle agg."""
    return sliding_agg(table(spark, sf_dir, "events"), size="2 days", slide="1 day")


@register(
    "t4_session_window",
    oracle="""
    WITH g AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
    ),
    s AS (
        SELECT user_id, ts, value,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM g
    )
    SELECT user_id,
           STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S')                     AS s_start,
           STRFTIME(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS s_end,
           COUNT(*)                                                    AS n_events,
           ROUND(SUM(value), 2)                                        AS session_value
    FROM s
    GROUP BY user_id, sid
    """,
)
def t4_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: 30-minute-gap session windows per user. The oracle builds
    the same sessions with the classic lag+cumsum gap-island SQL;
    session_window's end = last event + gap matches MAX(ts)+30min."""
    return session_agg(table(spark, sf_dir, "events"), gap="30 minutes")


@register(
    "t22_interval_join",
    oracle="""
    WITH v AS (SELECT user_id, event_id AS view_id, ts AS v_ts
               FROM events WHERE event_type = 'view'),
         b AS (SELECT user_id, event_id AS buy_id, ts AS b_ts
               FROM events WHERE event_type = 'purchase')
    SELECT v.user_id,
           CAST(COUNT(*) AS BIGINT)                 AS n_pairs,
           CAST(COUNT(DISTINCT v.view_id) AS BIGINT) AS n_views_converted,
           CAST(COUNT(DISTINCT b.buy_id) AS BIGINT)  AS n_buys_matched
    FROM v JOIN b ON v.user_id = b.user_id
               AND b.b_ts > v.v_ts
               AND b.b_ts <= v.v_ts + INTERVAL 24 HOUR
    GROUP BY v.user_id
    """,
)
def t22_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T22/J9 (VERDICT r4 #6): the watermarked stream–stream
    TIME-INTERVAL join's result contract, graded in batch — every
    (view, purchase) pair from the same user with the purchase in
    (view_ts, view_ts + 24h]. This is exactly the spec
    tests/test_streaming.py::test_j9_stream_stream_join replays
    through the file-stream harness (watermarks are no-ops in batch,
    so one definition serves both modes); here the pair set is
    hash-graded per user. Scale shape: equi-join on user_id (SMJ/
    shuffle on the key) with the time bound as a residual predicate —
    and in streaming the SAME bound is what lets Spark expire both
    sides' state past the watermark instead of growing it forever."""
    from pyspark.sql import functions as F

    e = table(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id"), F.col("event_id").alias("view_id"), F.col("ts").alias("v_ts")
    )
    b = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"),
        F.col("event_id").alias("buy_id"),
        F.col("ts").alias("b_ts"),
    )
    pairs = v.join(
        b,
        (F.col("user_id") == F.col("b_user"))
        & (F.col("b_ts") > F.col("v_ts"))
        & (F.col("b_ts") <= F.col("v_ts") + F.expr("INTERVAL 24 HOURS")),
    )
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("view_id").alias("n_views_converted"),
        F.countDistinct("buy_id").alias("n_buys_matched"),
    )


@register(
    "t23_session_tracker",
    oracle="""
    WITH g AS (
        SELECT user_id, ts,
               CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
    ),
    s AS (
        SELECT user_id, ts,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM g
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT)                    AS n_events,
           STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S')      AS first_ts,
           STRFTIME(MAX(ts), '%Y-%m-%d %H:%M:%S')      AS last_ts
    FROM s
    GROUP BY user_id, sid
    """,
)
def t23_session_tracker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T23/T6 (VERDICT r4 #6): the stateful session tracker's EXACT
    output contract (streaming/stateful.py SESSION_OUT: user_id,
    n_events, first_ts, last_ts — raw last event time, NOT
    last + gap like t4's session_window end), graded in batch via
    session_window + min/max. tests/test_streaming.py asserts the
    applyInPandasWithState tracker's closed sessions are a
    prefix-consistent subset of THESE rows, moving T6 from test-only
    into the graded surface: a tracker/gap bug now breaks both the
    subset assert and this hash. Scale: one shuffle on user_id;
    session merge is Spark's native sessionization, state bounded by
    watermark in streaming mode."""
    from pyspark.sql import functions as F

    e = table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first"),
            F.max("ts").alias("last"),
        )
        .select(
            "user_id",
            "n_events",
            F.date_format("first", "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
            F.date_format("last", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        )
    )


@register(
    "t24_full_outer_converts",
    oracle="""
    WITH v AS (SELECT user_id AS v_user, event_id AS view_id, ts AS v_ts
               FROM events WHERE event_type = 'view'),
         b AS (SELECT user_id AS b_user, event_id AS buy_id, ts AS b_ts
               FROM events WHERE event_type = 'purchase'),
         fo AS (
            SELECT v_user, view_id, b_user, buy_id
            FROM v FULL OUTER JOIN b
              ON v.v_user = b.b_user
             AND b.b_ts > v.v_ts
             AND b.b_ts <= v.v_ts + INTERVAL 24 HOUR
         )
    SELECT COALESCE(v_user, b_user) AS user_id,
           CAST(COUNT(CASE WHEN view_id IS NOT NULL AND buy_id IS NOT NULL
                           THEN 1 END) AS BIGINT) AS n_pairs,
           CAST(COUNT(CASE WHEN buy_id IS NULL THEN 1 END) AS BIGINT)
                                                  AS n_unconverted_views,
           CAST(COUNT(CASE WHEN view_id IS NULL THEN 1 END) AS BIGINT)
                                                  AS n_organic_buys
    FROM fo
    GROUP BY 1
    """,
)
def t24_full_outer_converts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T24/J9c (VERDICT r4 #6): the stream–stream FULL OUTER interval
    join's result contract in batch — matched (view, purchase) pairs
    PLUS null-padded unmatched rows from BOTH sides (views that never
    converted in 24h; purchases with no preceding view). In streaming
    mode an unmatched row can only be released once the watermark
    proves no partner can still arrive — the semantics
    tests/test_streaming.py::test_j9c_stream_stream_full_outer_join
    replays through the harness; here the per-user census of all
    three row classes is hash-graded. Same scale anatomy as t22: key
    shuffle + residual time bound + watermark-droppable state."""
    from pyspark.sql import functions as F

    e = table(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    b = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"),
        F.col("event_id").alias("buy_id"),
        F.col("ts").alias("b_ts"),
    )
    fo = v.join(
        b,
        (F.col("v_user") == F.col("b_user"))
        & (F.col("b_ts") > F.col("v_ts"))
        & (F.col("b_ts") <= F.col("v_ts") + F.expr("INTERVAL 24 HOURS")),
        "full_outer",
    )
    return fo.groupBy(
        F.coalesce("v_user", "b_user").alias("user_id")
    ).agg(
        F.count(
            F.when(F.col("view_id").isNotNull() & F.col("buy_id").isNotNull(), 1)
        ).alias("n_pairs"),
        F.count(F.when(F.col("buy_id").isNull(), 1)).alias("n_unconverted_views"),
        F.count(F.when(F.col("view_id").isNull(), 1)).alias("n_organic_buys"),
    )
