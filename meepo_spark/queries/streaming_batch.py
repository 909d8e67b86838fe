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
