"""Event-time window specs (T1-T5). The same functions run in batch
and streaming — `F.window` / `F.session_window` are mode-agnostic, so
the graded batch queries and the streaming tests share one definition
(the point of Spark's stream/table duality).

Watermark discipline (100 TB posture): every streaming aggregation
bounds its state with `withWatermark` — an unbounded-state streaming
agg is a memory leak wearing a query plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FMT = "yyyy-MM-dd HH:mm:ss"


def tumbling_agg(
    events: DataFrame,
    size: str = "1 day",
    watermark: str | None = None,
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """T2: tumbling event-time window aggregate."""
    df = events
    if watermark:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", size).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("w.start", FMT).alias("w_start"),
            F.date_format("w.end", FMT).alias("w_end"),
            *keys,
            "n",
            "total_value",
        )
    )


def sliding_agg(
    events: DataFrame,
    size: str = "2 days",
    slide: str = "1 day",
    watermark: str | None = None,
) -> DataFrame:
    """T3: sliding window — each event lands in size/slide windows."""
    df = events
    if watermark:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", size, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("w.start", FMT).alias("w_start"),
            F.date_format("w.end", FMT).alias("w_end"),
            "event_type",
            "n",
        )
    )


def session_agg(
    events: DataFrame, gap: str = "30 minutes", watermark: str | None = None
) -> DataFrame:
    """T4: session windows per user — a session extends while events
    arrive within ``gap`` of the last one; the window closes at
    last_ts + gap."""
    df = events
    if watermark:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("session_value"))
        .select(
            "user_id",
            F.date_format("w.start", FMT).alias("s_start"),
            F.date_format("w.end", FMT).alias("s_end"),
            "n_events",
            "session_value",
        )
    )
