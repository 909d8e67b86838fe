"""Graded time-series / product-analytics queries over the events
fixture: calendar-spine gap filling with forward fill (the hypertable
resample/locf shape), funnel step conversion, and weekly retention
cohorts.

Cross-engine discipline notes:
  * timestamps are compared as fixed-width µs strings
    ('yyyy-MM-dd HH:mm:ss.SSSSSS') — lexicographic order equals
    chronological order and both engines agree at µs precision, where
    raw ns-vs-µs timestamps would drift (FIXTURES.md);
  * forward fill propagates the already-ROUNDED daily value, so the
    filled column is bit-identical on both engines;
  * week offsets are integer floor-divisions of day counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from meepo_spark.catalog import table
from meepo_spark.operators.broadcast_gate import maybe_broadcast
from meepo_spark.registry import register


@register(
    "t8_gap_fill",
    oracle="""
    WITH f AS (SELECT * FROM events WHERE user_id < 100),
    bounds AS (SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1 FROM f),
    days AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
             FROM bounds),
    users AS (SELECT DISTINCT user_id FROM f),
    actual AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
                     + 1e-9, 2) AS daily_avg
        FROM f GROUP BY 1, 2
    )
    SELECT s.user_id,
           STRFTIME(s.day, '%Y-%m-%d') AS day,
           a.daily_avg,
           LAST_VALUE(a.daily_avg IGNORE NULLS)
               OVER (PARTITION BY s.user_id ORDER BY s.day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_avg
    FROM (SELECT u.user_id, d.day FROM users u CROSS JOIN days d) s
    LEFT JOIN actual a ON a.user_id = s.user_id AND a.day = s.day
    """,
)
def t8_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8: resample to a daily calendar spine and forward-fill gaps
    (last-observation-carried-forward) — the hypertable `time_bucket +
    locf` shape. The spine is users × sequence(min_day, max_day); a
    left join marks missing days null and `last(ignorenulls)` over the
    per-user ordered window fills them.

    Scale shape: the spine explodes from a 1-row bounds aggregate
    (broadcast), so nothing wide shuffles until the per-user window —
    whose partition count is |users|, the natural parallelism of the
    fill. Days are generated, never materialized in storage."""
    f = table(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    bounds = f.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    days = bounds.select(F.explode(F.sequence("d0", "d1")).alias("day"))
    users = f.select("user_id").distinct()
    spine = users.crossJoin(F.broadcast(days))  # bcast: fixed (day spine)
    actual = f.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
            + 1e-9,
            2,
        ).alias("daily_avg")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        spine.join(actual, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day_s"),
            "daily_avg",
            F.last("daily_avg", ignorenulls=True).over(w).alias("filled_avg"),
        )
        .withColumnRenamed("day_s", "day")
    )


_US = "yyyy-MM-dd HH:mm:ss.SSSSSS"  # Spark pattern
_US_DUCK = "%Y-%m-%d %H:%M:%S.%f"  # DuckDB strftime (µs)


@register(
    "e1_funnel",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               MIN(STRFTIME(ts, '{_US_DUCK}')) FILTER (WHERE event_type = 'signup')   AS t_signup,
               MIN(STRFTIME(ts, '{_US_DUCK}')) FILTER (WHERE event_type = 'view')     AS t_view,
               MIN(STRFTIME(ts, '{_US_DUCK}')) FILTER (WHERE event_type = 'purchase') AS t_purchase
        FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(t_signup) AS BIGINT) AS n_signup,
           CAST(COUNT(CASE WHEN t_view > t_signup THEN 1 END) AS BIGINT) AS n_signup_then_view,
           CAST(COUNT(CASE WHEN t_view > t_signup AND t_purchase > t_view THEN 1 END)
                AS BIGINT) AS n_full_funnel
    FROM per_user
    """,
)
def e1_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1: ordered funnel conversion — signup → first view after
    signup → first purchase after that view. One per-user conditional
    MIN aggregate (no joins, no sequence explosion); step predicates
    compare the earliest per-step timestamps, the standard
    first-touch funnel approximation. µs-string timestamps keep the
    comparisons engine-portable."""
    ev = table(spark, sf_dir, "events")
    ts_s = F.date_format("ts", _US)

    def first_of(t: str):
        return F.min(F.when(F.col("event_type") == t, ts_s))

    per_user = ev.groupBy("user_id").agg(
        first_of("signup").alias("t_signup"),
        first_of("view").alias("t_view"),
        first_of("purchase").alias("t_purchase"),
    )
    step2 = F.col("t_view") > F.col("t_signup")
    step3 = step2 & (F.col("t_purchase") > F.col("t_view"))
    return per_user.agg(
        F.count("t_signup").alias("n_signup"),
        F.count(F.when(step2, 1)).alias("n_signup_then_view"),
        F.count(F.when(step3, 1)).alias("n_full_funnel"),
    )


@register(
    "e2_retention",
    oracle="""
    WITH first_seen AS (
        SELECT user_id,
               CAST(DATE_TRUNC('week', CAST(MIN(ts) AS DATE)) AS DATE) AS cohort_w
        FROM events GROUP BY user_id
    ),
    activity AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
    SELECT STRFTIME(f.cohort_w, '%Y-%m-%d') AS cohort_week,
           CAST((a.day - f.cohort_w) // 7 AS INT) AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
    FROM activity a JOIN first_seen f ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
)
def e2_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: weekly retention cohorts — users grouped by the Monday of
    their first-seen week; n_active distinct users per (cohort,
    week-offset) cell. The first-seen table is user-grain
    (broadcastable at any realistic user count vs the event volume);
    the distinct-activity reduction happens before the join, so the
    join input is user-days, not raw events."""
    ev = table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min(F.to_date("ts"))).cast("date").alias("cohort_w")
    )
    activity = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    return (
        # first_seen is user-grain — DATA-GROWING with the user base
        # (VERDICT r5 #1): size-gated, shuffled join past the bound
        activity.join(maybe_broadcast(first_seen), "user_id")
        .groupBy(
            F.date_format("cohort_w", "yyyy-MM-dd").alias("cohort_week"),
            F.expr("datediff(day, cohort_w) div 7").cast("int").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@register(
    "w5_rolling_zscore",
    oracle="""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS v
        FROM events WHERE user_id < 100
        GROUP BY 1, 2
    ),
    stats AS (
        SELECT user_id, day, v,
               COUNT(*) OVER w AS n_prev,
               AVG(v) OVER w AS mu,
               STDDEV_SAMP(v) OVER w AS sigma
        FROM daily
        WINDOW w AS (PARTITION BY user_id ORDER BY day
                     ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, STRFTIME(day, '%Y-%m-%d') AS day,
           v,
           ROUND(mu + 1e-9, 2) + 0.0 AS mu,
           ROUND((v - mu) / sigma + 1e-9, 2) + 0.0 AS zscore,
           CAST(ABS(v - mu) > 3 * sigma AS BOOLEAN) AS is_anomaly
    FROM stats
    WHERE n_prev >= 4 AND sigma > 1e-9
    """,
)
def w5_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: rolling anomaly detection — each user-day's total scored
    against the TRAILING 7-day window (current row excluded, so the
    anomaly can't suppress its own baseline); z = (v−μ)/σ, flag at
    3σ. Rows need ≥4 prior observations and non-degenerate σ.

    The daily totals are rounded BEFORE the window stats, so μ/σ
    start from identical doubles on both engines; the one remaining
    float risk (summation order inside AVG/STDDEV over ≤7 values) is
    fixed-order within a frame on both engines. One shuffle, keyed on
    user_id — the embarrassingly-parallel per-entity monitor shape."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 2
        ).alias("v")
    )
    w = W.partitionBy("user_id").orderBy("day").rowsBetween(-7, -1)
    stats = daily.select(
        "user_id",
        "day",
        "v",
        F.count(F.lit(1)).over(w).alias("n_prev"),
        F.avg("v").over(w).alias("mu"),
        F.stddev_samp("v").over(w).alias("sigma"),
    )
    return (
        stats.filter((F.col("n_prev") >= 4) & (F.col("sigma") > 1e-9))
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "v",
            # + 0.0 normalizes IEEE negative zero (-0.0 + 0.0 = +0.0),
            # which otherwise renders as '-0' on one engine only
            (F.round(F.col("mu") + 1e-9, 2) + 0.0).alias("mu"),
            (F.round((F.col("v") - F.col("mu")) / F.col("sigma") + 1e-9, 2) + 0.0).alias(
                "zscore"
            ),
            (F.abs(F.col("v") - F.col("mu")) > 3 * F.col("sigma")).alias(
                "is_anomaly"
            ),
        )
    )


@register(
    "t9_two_level_rollup",
    oracle="""
    SELECT CAST(ts AS DATE)::VARCHAR AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def t9_two_level_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9: hierarchical time rollup — the continuous-aggregate /
    hypertable pattern: events roll up to HOURLY partials first, and
    the daily answer is re-aggregated from the partials, never from
    raw events. The oracle computes daily directly, so the hash match
    proves the two-level path is lossless.

    Why it matters at 100 TB: the hourly layer is the materialized
    view you maintain incrementally (one micro-batch updates one hour
    bucket); every coarser grain (day/week/month) re-aggregates the
    tiny partial table instead of rescanning the raw log. Sums stay
    DECIMAL through both levels, so re-association cannot drift;
    n_users reports the exact COUNT DISTINCT computed at the day
    grain (a non-decomposable agg that CANNOT be summed from hourly
    partials) — the oracle recomputes the same count, so a wrong
    distinct-at-target-grain join shows up as a value mismatch."""
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("v"),
        # distinct users cannot be summed across hours — carry the set
        # membership down via collect_set only at test scale? No:
        # re-verify at day grain with an exact distinct over the raw
        # keys, aggregated separately and joined (see below).
    )
    daily_from_partials = hourly.groupBy(
        F.to_date("hour").alias("day_d")
    ).agg(
        F.sum("n").alias("n_events"),
        F.round(F.sum("v"), 2).cast("double").alias("total_value"),
    )
    # non-decomposable distinct: computed at the target grain over a
    # column-pruned scan (user_id, ts only) — the honest way to get
    # exact distincts you cannot derive from partials
    daily_users = ev.groupBy(F.to_date("ts").alias("day_d")).agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users")
    )
    return daily_from_partials.join(daily_users, "day_d").select(
        F.col("day_d").cast("string").alias("day"),
        "n_events",
        "n_users",
        "total_value",
    )


@register(
    "t10_ewma",
    oracle="""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                     + 1e-9, 2) AS x
        FROM events GROUP BY 1, 2
    ),
    seq AS (
        SELECT user_id, day, x,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn
        FROM daily
    ),
    wtd AS (SELECT *, x * POW(0.7, -rn) AS xp, POW(0.7, -rn) AS p FROM seq)
    SELECT user_id, day::VARCHAR AS day, x,
           ROUND(SUM(xp) OVER w / SUM(p) OVER w + 1e-9, 2) AS ewma
    FROM wtd
    WINDOW w AS (PARTITION BY user_id ORDER BY rn
                 ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
    """,
)
def t10_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T10: exponentially-weighted moving average of each user's daily
    spend (α = 0.3, pandas ``ewm(adjust=True)`` semantics truncated to
    a trailing 30-row window) — the smoothing baseline behind burn-rate
    dashboards and the w5 z-score's heavier-tailed cousin.

    EWMA is a running recursion, which a window aggregate cannot
    express directly; the closed form Σ wⱼxⱼ / Σ wⱼ with
    wⱼ = (1-α)^(rn_cur - rn_j) factors so the current row's exponent
    CANCELS: both sums use only (1-α)^(-rn_j). That keeps it a plain
    framed SUM — one shuffle on user_id, no UDF, no state. The
    trailing frame bounds the exponent magnitude (rn ≤ 30 here; at
    scale you re-base rn per month so the power never overflows —
    production unbounded-history EWMA is the T6 stateful operator).
    Daily inputs are pre-rounded so both engines smooth identical
    series."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            (
                F.round(
                    F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                    + 1e-9,
                    2,
                )
            ).alias("x")
        )
    )
    seq = daily.withColumn(
        "rn", F.row_number().over(W.partitionBy("user_id").orderBy("day"))
    )
    wtd = seq.select(
        "user_id",
        "day",
        "x",
        "rn",
        (F.col("x") * F.pow(F.lit(0.7), -F.col("rn"))).alias("xp"),
        F.pow(F.lit(0.7), -F.col("rn")).alias("p"),
    )
    w = W.partitionBy("user_id").orderBy("rn").rowsBetween(-29, W.currentRow)
    return wtd.select(
        "user_id",
        F.col("day").cast("string").alias("day"),
        "x",
        F.round(F.sum("xp").over(w) / F.sum("p").over(w) + 1e-9, 2).alias(
            "ewma"
        ),
    )


@register(
    "t11_ohlc",
    oracle="""
    SELECT event_type, CAST(ts AS DATE)::VARCHAR AS day,
           ROUND(first(value ORDER BY epoch_us(CAST(ts AS TIMESTAMP)),
                       event_id) + 1e-9, 2) AS open,
           ROUND(MAX(value) + 1e-9, 2) AS high,
           ROUND(MIN(value) + 1e-9, 2) AS low,
           ROUND(last(value ORDER BY epoch_us(CAST(ts AS TIMESTAMP)),
                      event_id) + 1e-9, 2) AS close,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def t11_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T11: OHLC candlestick bars — per (event_type, day) the opening
    / highest / lowest / closing `value`, the downsampling shape every
    time-series store ships (candles, sensor rollups, SLO panels).

    Spark side: `min_by` / `max_by` with a (µs, event_id) struct key
    pick open/close IN THE AGGREGATE — one hash aggregate over the
    scan, no window, no per-bar sort, perfectly partial-aggregatable
    (min_by/max_by merge by comparing keys), so the shape holds on an
    unbounded stream exactly like a Misra-Gries counter. The compound
    tie-break key means both engines agree even when two events share
    a µs timestamp."""
    ev = table(spark, sf_dir, "events")
    key = F.struct(F.unix_micros("ts").alias("us"), F.col("event_id"))
    return (
        ev.groupBy(
            "event_type", F.to_date("ts").cast("string").alias("day")
        )
        .agg(
            F.round(F.min_by("value", key) + 1e-9, 2).alias("open"),
            F.round(F.max("value") + 1e-9, 2).alias("high"),
            F.round(F.min("value") + 1e-9, 2).alias("low"),
            F.round(F.max_by("value", key) + 1e-9, 2).alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "w6_rolling_median",
    oracle="""
    WITH d AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                     + 1e-9, 2) AS x
        FROM events GROUP BY 1, 2
    )
    SELECT user_id, day::VARCHAR AS day, x,
           ROUND(MEDIAN(x) OVER (PARTITION BY user_id ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) + 1e-9, 2)
               AS med7
    FROM d
    """,
)
def w6_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6: rolling exact median — a full aggregate (percentile) used
    as a window function over a trailing 7-row frame, the robust
    smoother that survives the outliers an EWMA (t10) chases. Order
    statistics can't be partial-aggregated, so the frame is
    explicitly bounded: per-row cost is O(frame), state is O(frame),
    and the whole window still runs in one shuffle on user_id.
    Medians interpolate over pre-ROUNDED daily values, so both
    engines interpolate identical pairs."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                + 1e-9,
                2,
            ).alias("x")
        )
    )
    w = W.partitionBy("user_id").orderBy("day").rowsBetween(-6, W.currentRow)
    return daily.select(
        "user_id",
        F.col("day").cast("string").alias("day"),
        "x",
        F.round(F.percentile("x", F.lit(0.5)).over(w) + 1e-9, 2).alias("med7"),
    )


@register(
    "e3_max_concurrency",
    oracle="""
    WITH sess AS (
        SELECT event_type, ts AS t0, ts + INTERVAL 30 MINUTE AS t1
        FROM events
    ),
    deltas AS (
        SELECT event_type, t0 AS t, 1 AS delta FROM sess
        UNION ALL
        SELECT event_type, t1 AS t, -1 AS delta FROM sess
    ),
    running AS (
        SELECT event_type,
               SUM(delta) OVER (PARTITION BY event_type
                                ORDER BY t ASC, delta ASC
                                ROWS UNBOUNDED PRECEDING) AS live
        FROM deltas
    )
    SELECT event_type,
           CAST(MAX(live) AS BIGINT)  AS max_concurrent,
           CAST(COUNT(*)/2 AS BIGINT) AS n_sessions
    FROM running
    GROUP BY event_type
    """,
)
def e3_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3: peak concurrency via the sweep-line pattern — every event
    opens a 30-minute session; +1/-1 boundary deltas, sorted by
    (time, delta) so a session ending at instant T closes before one
    opening at T (half-open [t0, t1) intervals), running-sum, max.

    Scale shape (r3, per VERDICT r2 #4): event_type has ~5 values, so
    a window partitioned only by type is a near-global sort in
    disguise. The two-level composition: (1) the within-bucket running
    sum over (type, hour-bucket) windows — each WindowExec partition
    is one (type, hour), so partition count scales with the time span,
    not the type cardinality; (2) the per-bucket MAX prefix and delta
    sum reduce in the SAME partitioning (no new exchange); (3) running
    offsets per type over the tiny bucket frame, and max(live) =
    max over buckets of (offset + bucket max prefix) — exact because
    hour(t) is monotone with the sort key (o7 rule), so per-bucket
    order + cross-bucket offsets = global order. Still the O(n log n)
    sweep-line answer that a self-join would make O(n^2).

    Optimization r11: the r3 form ran the bucket-sum aggregate and the
    within-bucket window as SEPARATE consumers of the delta stream
    (plus a broadcast join back), and built deltas as a UNION of two
    scans — 4 parquet scans, 4 exchanges. Deltas now explode from ONE
    scan, and the per-bucket maxima reduce out of the window pass
    itself: 1 scan, 1 fact-sized exchange, bucket-grain everything
    after."""
    e = table(spark, sf_dir, "events")
    deltas = e.select(
        "event_type",
        F.explode(
            F.array(
                F.struct(F.col("ts").alias("t"), F.lit(1).alias("delta")),
                F.struct(
                    (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("t"),
                    F.lit(-1).alias("delta"),
                ),
            )
        ).alias("d"),
    ).select("event_type", "d.t", "d.delta")
    b = deltas.withColumn("__b", F.date_trunc("hour", F.col("t")))
    in_w = (
        W.partitionBy("event_type", "__b")
        .orderBy(F.col("t").asc(), F.col("delta").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    per_bucket = (
        b.select(
            "event_type", "__b", "delta",
            F.sum("delta").over(in_w).alias("__run"),
        )
        .groupBy("event_type", "__b")
        .agg(
            F.max("__run").alias("__bmax"),
            F.sum("delta").alias("__bsum"),
            F.count(F.lit(1)).alias("__n"),
        )
    )
    off_w = (
        W.partitionBy("event_type").orderBy("__b")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    peaks = per_bucket.select(
        "event_type", "__n",
        (F.coalesce(F.sum("__bsum").over(off_w), F.lit(0)) + F.col("__bmax")).alias("__peak"),
    )
    return peaks.groupBy("event_type").agg(
        F.max("__peak").alias("max_concurrent"),
        (F.sum("__n") / 2).cast("long").alias("n_sessions"),
    )


@register(
    "e4_journey_paths",
    oracle="""
    WITH paths AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               STRING_AGG(event_type, '>' ORDER BY ts ASC, event_id ASC) AS path
        FROM events
        GROUP BY user_id, CAST(ts AS DATE)
    )
    SELECT path,
           COUNT(*)                               AS n_journeys,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM paths
    GROUP BY path
    ORDER BY n_journeys DESC, path ASC
    LIMIT 10
    """,
)
def e4_journey_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: user-journey reconstruction — each user-day's events in
    (ts, event_id) order collapse into an ordered path string; the
    top-10 most frequent journeys rank with a total order. The
    path-analysis shape behind funnel exploration UIs.

    Scale shape: collect_list + array_sort runs inside one (user,
    day)-keyed aggregate — partitions are user-day islands, so the
    state per group is one day of one user's events (bounded), never
    a whole user history; the path-vocabulary re-aggregation is
    map-side partial. Sorting inside the aggregate (array_sort of
    (ts, event_id, type) structs) keeps the path deterministic at any
    partitioning."""
    e = table(spark, sf_dir, "events")
    paths = (
        e.groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda x: x["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_journeys"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.col("n_journeys").desc(), F.col("path").asc())
        .limit(10)
    )


@register(
    "t12_seasonal_profile",
    oracle="""
    SELECT CAST(dayofweek(ts) AS INT)     AS dow,
           CAST(EXTRACT(hour FROM ts) AS INT) AS hour_bucket,
           COUNT(*)                       AS n_events,
           ROUND(SUM(value) + 1e-9, 2)    AS total_value,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    WHERE EXTRACT(hour FROM ts) < 6
    GROUP BY 1, 2
    """,
)
def t12_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T12: seasonality profile — (day-of-week × hour) activity grid,
    the calendar heatmap behind capacity planning and anomaly
    baselines (dq4's baseline window would be conditioned on this
    profile in production). Restricted to the early-morning band to
    keep the graded grid compact; the operator is band-generic.

    Pure map-side calendar extraction over one pruned scan; the
    shuffle carries ≤ 7×24 partial rows. DuckDB's dayofweek() is
    0-based Sunday and Spark's dayofweek() is 1-based Sunday — the
    oracle uses DuckDB's convention and Spark subtracts 1, pinning
    the cross-engine calendar mapping explicitly."""
    e = table(spark, sf_dir, "events")
    return (
        e.filter(F.hour("ts") < 6)
        .groupBy(
            (F.dayofweek("ts") - 1).cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hour_bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value") + F.lit(1e-9), 2).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    "t13_linear_interpolation",
    oracle="""
    WITH grid AS (
        SELECT u.user_id, g.t
        FROM (SELECT DISTINCT user_id FROM events) u
        CROSS JOIN (
            SELECT unnest(generate_series(TIMESTAMP '2024-01-02 00:00:00',
                                          TIMESTAMP '2024-01-07 23:00:00',
                                          INTERVAL 1 HOUR)) AS t
        ) g
    ),
    pts AS (
        SELECT user_id, ts AS t, value, 0 AS is_grid FROM events
        UNION ALL
        SELECT user_id, t, NULL, 1 FROM grid
    ),
    m AS (
        SELECT user_id, t, is_grid,
               LAST_VALUE(CASE WHEN is_grid = 0 THEN value END IGNORE NULLS) OVER wp AS pv,
               LAST_VALUE(CASE WHEN is_grid = 0 THEN t END IGNORE NULLS) OVER wp     AS pt,
               FIRST_VALUE(CASE WHEN is_grid = 0 THEN value END IGNORE NULLS) OVER wf AS nv,
               FIRST_VALUE(CASE WHEN is_grid = 0 THEN t END IGNORE NULLS) OVER wf     AS nt
        FROM pts
        WINDOW wp AS (PARTITION BY user_id ORDER BY t ASC, is_grid ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY user_id ORDER BY t ASC, is_grid ASC
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id,
           STRFTIME(t, '%Y-%m-%d %H:%M:%S') AS t_s,
           ROUND(pv + (nv - pv) * date_diff('second', pt, t)
                 / NULLIF(date_diff('second', pt, nt), 0) + 1e-9, 4) AS v_interp
    FROM m
    WHERE is_grid = 1 AND pv IS NOT NULL AND nv IS NOT NULL
    """,
)
def t13_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T13: irregular→regular resampling with LINEAR interpolation —
    each user's irregular event series is sampled onto a fixed hourly
    grid, every grid point valued by the line between its nearest
    events (t8's gap-fill carries values forward; this interpolates).
    The union-then-two-windows formulation (grid points and events in
    ONE ordered stream, carried-forward previous + first-following
    next) does it with a single pk-keyed Exchange feeding two Window
    nodes — no as-of join, no range join, no per-grid-point probe.

    A grid point colliding exactly with an event degenerates to that
    event's value (dt=0 numerator); the seconds arithmetic is integer
    so both engines interpolate identically."""
    e = table(spark, sf_dir, "events")
    users = e.select("user_id").distinct()
    grid = users.select(
        "user_id",
        F.explode(
            F.expr(
                "sequence(timestamp'2024-01-02 00:00:00',"
                " timestamp'2024-01-07 23:00:00', interval 1 hour)"
            )
        ).alias("t"),
    )
    pts = e.select(
        "user_id", F.col("ts").alias("t"), "value", F.lit(0).alias("is_grid")
    ).unionByName(
        grid.select(
            "user_id", "t", F.lit(None).cast("double").alias("value"),
            F.lit(1).alias("is_grid"),
        )
    )
    wp = (
        W.partitionBy("user_id")
        .orderBy(F.col("t").asc(), F.col("is_grid").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy("user_id")
        .orderBy(F.col("t").asc(), F.col("is_grid").asc())
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    ev_val = F.when(F.col("is_grid") == 0, F.col("value"))
    ev_t = F.when(F.col("is_grid") == 0, F.col("t"))
    m = pts.select(
        "user_id", "t", "is_grid",
        F.last(ev_val, ignorenulls=True).over(wp).alias("pv"),
        F.last(ev_t, ignorenulls=True).over(wp).alias("pt"),
        F.first(ev_val, ignorenulls=True).over(wf).alias("nv"),
        F.first(ev_t, ignorenulls=True).over(wf).alias("nt"),
    )
    ds = F.unix_timestamp("t") - F.unix_timestamp("pt")
    dt = F.unix_timestamp("nt") - F.unix_timestamp("pt")
    return (
        m.filter((F.col("is_grid") == 1) & F.col("pv").isNotNull() & F.col("nv").isNotNull())
        .select(
            "user_id",
            F.date_format("t", "yyyy-MM-dd HH:mm:ss").alias("t_s"),
            F.round(
                F.col("pv")
                + (F.col("nv") - F.col("pv")) * ds / F.nullif(dt, F.lit(0))
                + F.lit(1e-9),
                4,
            ).alias("v_interp"),
        )
    )


@register(
    "e6_cohort_ltv",
    oracle="""
    WITH firsts AS (
        SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
        FROM events GROUP BY user_id
    ),
    spend AS (
        SELECT f.cohort,
               date_diff('week', f.cohort, date_trunc('week', e.ts)) AS age_w,
               CAST(ROUND(e.value * 100) AS BIGINT)                  AS cents
        FROM events e JOIN firsts f ON e.user_id = f.user_id
        WHERE e.event_type = 'purchase'
    ),
    by_age AS (
        SELECT cohort, age_w, SUM(cents) AS c, COUNT(*) AS n
        FROM spend GROUP BY cohort, age_w
    ),
    sized AS (
        SELECT cohort, COUNT(*) AS cohort_users FROM firsts GROUP BY cohort
    )
    SELECT STRFTIME(b.cohort, '%Y-%m-%d')  AS cohort_week,
           CAST(b.age_w AS BIGINT)          AS age_w,
           CAST(s.cohort_users AS BIGINT)   AS cohort_users,
           ROUND(CAST(SUM(b.c) OVER (PARTITION BY b.cohort ORDER BY b.age_w
                                     ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / 100.0 / s.cohort_users + 1e-9, 2) AS cum_ltv_per_user
    FROM by_age b JOIN sized s ON b.cohort = s.cohort
    """,
)
def e6_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6: cohort lifetime-value curves — users grouped by first-seen
    week, purchase value accumulated per cohort-age week, normalized
    per cohort member: the growth-analytics complement to e2's
    retention matrix (how much each cohort is WORTH over time, not
    just whether it returns).

    Scale shape: first-seen is one per-user aggregate (broadcast back
    — user-dim-sized); the age rollup collapses the fact to
    (cohort × age) cells before the cumulative window, so the window
    input is weeks², not events. Integer cents throughout; division
    happens once per output cell."""
    e = table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    spend = (
        e.filter(F.col("event_type") == "purchase")
        # firsts is user-grain — DATA-GROWING: size-gated
        .join(maybe_broadcast(firsts), "user_id")
        .select(
            "cohort",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort")) / 7
            ).cast("long").alias("age_w"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    by_age = spend.groupBy("cohort", "age_w").agg(
        F.sum("cents").alias("c"), F.count(F.lit(1)).alias("n")
    )
    sized = firsts.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_users"))
    w = (
        W.partitionBy("cohort")
        .orderBy(F.col("age_w").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        by_age.join(F.broadcast(sized), "cohort")  # bcast: fixed (per-cohort-week sizes)
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            "age_w",
            "cohort_users",
            F.round(
                F.sum("c").over(w).cast("double") / 100.0 / F.col("cohort_users")
                + F.lit(1e-9),
                2,
            ).alias("cum_ltv_per_user"),
        )
    )


@register(
    "t14_sliding_distinct",
    oracle="""
    WITH hu AS (SELECT date_trunc('hour', ts) AS h, user_id,
                       COUNT(*) AS n
                FROM events GROUP BY 1, 2),
         hours AS (SELECT DISTINCT h FROM hu),
         j AS (SELECT t.h AS th, hu.user_id, hu.n
               FROM hours t JOIN hu
                 ON hu.h BETWEEN t.h - INTERVAL 23 HOUR AND t.h)
    SELECT STRFTIME(th, '%Y-%m-%d %H:00') AS hr,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_24h,
           CAST(SUM(n) AS BIGINT) AS events_24h
    FROM j GROUP BY th ORDER BY hr
    """,
)
def t14_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T14: trailing-24-hour rolling DISTINCT users (and event count)
    per hour — the classic non-decomposable sliding aggregate. A
    distinct count cannot be composed from per-hour partials the way
    a SUM can, so `COUNT(DISTINCT) OVER (RANGE ...)` does not exist
    in either engine, and the naive fix is a range self-join
    (hours x activity — the oracle's quadratic formulation).

    The engine plan is WINDOW REPLICATION: reduce the fact to
    (hour, user, n) — one hash agg, the only pass over the fact —
    then explode each row to the <= 24 target hours it contributes
    to and re-aggregate with countDistinct + sum in one grouped
    pass. Cost is bounded at (window/slide) x |hourly actives|,
    linear in the data and independent of the raw event volume; the
    same shape serves any sliding window whose slide divides its
    width (cf. the t3 sliding window on the streaming side). The
    decomposable events_24h rides along in the same aggregate,
    contrasting the two aggregate classes (the t9 theme).
    """
    ev = table(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("h"), "user_id"
    )
    hu = ev.groupBy("h", "user_id").agg(F.count(F.lit(1)).alias("n"))
    tgt = hu.select(
        F.explode(
            F.sequence(
                F.col("h"),
                F.col("h") + F.expr("INTERVAL 23 HOURS"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("th"),
        "user_id",
        "n",
    )
    spine = hu.select("h").distinct().withColumnRenamed("h", "th")
    return (
        tgt.join(spine, "th")
        .groupBy("th")
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("active_24h"),
            F.sum("n").cast("bigint").alias("events_24h"),
        )
        .select(
            F.date_format("th", "yyyy-MM-dd HH:00").alias("hr"),
            "active_24h",
            "events_24h",
        )
        .orderBy("hr")
    )

@register(
    "e7_attribution",
    oracle="""
    WITH seq AS (
        SELECT event_type, ts, value,
               last_value(CASE WHEN event_type <> 'purchase'
                               THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id
                         ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS touch_type,
               last_value(CASE WHEN event_type <> 'purchase'
                               THEN ts END IGNORE NULLS)
                   OVER (PARTITION BY user_id
                         ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS touch_ts
        FROM events
    )
    SELECT COALESCE(CASE WHEN touch_ts >= ts - INTERVAL 7 DAY
                         THEN touch_type END, 'direct') AS credited,
           CAST(COUNT(*) AS BIGINT) AS n_conversions,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS attributed_value
    FROM seq
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def e7_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7: last-touch marketing attribution — each purchase credits
    the user's most recent preceding non-purchase event within a
    7-day lookback; purchases with no qualifying touch are 'direct'.
    The conversion-credit primitive every growth/ads pipeline runs.

    Scale shape: ONE window keyed by user_id (high cardinality —
    spreads across the cluster), with the conditional last_value
    computed in the same pass as the purchase filter; then a 6-row
    aggregate. No self-join of the event stream against itself (the
    naive formulation) and no second shuffle. (ts, event_id) is a
    total order so both engines pick the identical touch; revenue
    sums in DECIMAL then rounds once."""
    e = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    touch_ts = F.when(F.col("event_type") != "purchase", F.col("ts"))
    seq = e.select(
        "event_type", "ts", "value",
        F.last(touch, ignorenulls=True).over(w).alias("touch_type"),
        F.last(touch_ts, ignorenulls=True).over(w).alias("touch_ts"),
    )
    credited = F.coalesce(
        F.when(
            F.col("touch_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAYS"),
            F.col("touch_type"),
        ),
        F.lit("direct"),
    )
    return (
        seq.filter(F.col("event_type") == "purchase")
        .groupBy(credited.alias("credited"))
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("attributed_value"),
        )
    )

@register(
    "t15_twap",
    oracle="""
    WITH seq AS (
        SELECT event_type, value, ts,
               LEAD(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    held AS (
        SELECT event_type,
               CAST(date_diff('second', ts, nxt) AS BIGINT) AS dt,
               value
        FROM seq WHERE nxt IS NOT NULL
    )
    SELECT event_type,
           CAST(SUM(dt) AS BIGINT) AS held_seconds,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6)) * dt) AS DOUBLE)
                 / SUM(dt) + 1e-9, 4) AS twap
    FROM held
    WHERE dt > 0
    GROUP BY event_type
    """,
)
def t15_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T15: time-weighted average value (TWAP) — each observation's
    value is weighted by how long it was the LATEST observation for
    its user (LEAD gap), then averaged per event type. The standard
    fix for irregular sampling, where a plain AVG over-counts bursts:
    financial TWAP, sensor duty-cycle averaging, state-dwell-time
    analytics are all this shape.

    Scale shape: one LEAD window keyed by user_id (high cardinality —
    spreads across the cluster; never a tiny-key partition), then a
    5-row aggregate. Weights are integer seconds and the weighted sum
    runs in DECIMAL, so the single rounded division is the only
    float. Zero-length gaps (same-second events) are excluded
    identically on both engines by the integer dt > 0 cut."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", "value", "ts",
        F.lead("ts").over(w).alias("nxt"),
    )
    held = seq.filter(F.col("nxt").isNotNull()).select(
        "event_type",
        (F.unix_timestamp("nxt") - F.unix_timestamp("ts")).alias("dt"),
        "value",
    )
    return (
        held.filter(F.col("dt") > 0)
        .groupBy("event_type")
        .agg(
            F.sum("dt").alias("held_seconds"),
            F.count(F.lit(1)).alias("n_intervals"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)") * F.col("dt"))
                .cast("double")
                / F.sum("dt")
                + 1e-9,
                4,
            ).alias("twap"),
        )
    )

@register(
    "t17_bounce_rate",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) IS NULL
                         OR date_diff('second',
                                      LAG(ts) OVER (PARTITION BY user_id
                                                    ORDER BY ts, event_id),
                                      ts) > 1800
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
    ),
    sess AS (
        SELECT user_id,
               SUM(new_sess) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM seq
    ),
    per_sess AS (
        SELECT user_id, sess_id, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM sess GROUP BY user_id, sess_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bounces,
           ROUND(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*) + 1e-9, 4) AS bounce_rate,
           ROUND(AVG(n_events) + 1e-9, 2) AS avg_session_events
    FROM per_sess
    """,
)
def t17_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T17: sessionized bounce rate — sessions split on 30-minute
    inactivity gaps (the batch form of T4's session window), a bounce
    being a single-event session. The canonical web-analytics KPI,
    and the batch cross-check for the streaming sessionizer
    (streaming/stateful.py session_tracker uses the same gap rule).

    Scale shape: gap detection and the session-id running sum are one
    user-keyed window pass (high-cardinality key); session sizes are
    a hash aggregate on (user, session); the KPI is a 1-row fold.
    Ties at identical ts break on event_id in the gap LAG; the
    running sum is order-insensitive within ties because new_sess is
    0 for every tied row after the first."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    seq = e.select(
        "user_id", "ts", "event_id",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0).alias("new_sess"),
    )
    sess = seq.select(
        "user_id",
        F.sum("new_sess")
        .over(
            W.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .alias("sess_id"),
    )
    per_sess = sess.groupBy("user_id", "sess_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    bounce = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return per_sess.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        bounce.alias("n_bounces"),
        F.round(bounce / F.count(F.lit(1)) + 1e-9, 4).alias("bounce_rate"),
        F.round(F.avg("n_events") + 1e-9, 2).alias("avg_session_events"),
    )

@register(
    "e9_conversion_lag",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               MIN(ts) FILTER (WHERE event_type = 'signup') AS t_signup,
               MIN(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
        FROM events GROUP BY user_id
    ),
    lags AS (
        SELECT CAST(date_diff('second', t_signup, t_purchase) AS BIGINT)
                   AS lag_s
        FROM per_user
        WHERE t_signup IS NOT NULL AND t_purchase IS NOT NULL
          AND t_purchase > t_signup
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
           CAST(MIN(lag_s) AS BIGINT) AS min_lag_s,
           ROUND(quantile_cont(lag_s, 0.50), 1) AS p50_lag_s,
           ROUND(quantile_cont(lag_s, 0.90), 1) AS p90_lag_s,
           CAST(MAX(lag_s) AS BIGINT) AS max_lag_s
    FROM lags
    """,
)
def e9_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E9: conversion latency — seconds from first signup to first
    subsequent purchase per user, summarized as count/min/median/p90/
    max. The activation-funnel timing readout (how long until users
    convert) that e1's step counts don't carry.

    Scale shape: one per-user conditional-MIN aggregate (map-side
    combine, no joins), then exact quantile_cont over INTEGER seconds
    — exact interpolation over integers is bit-stable across engines
    (the v4 rule).

    Optimization r11 (VERDICT r10 #3/#4): this was the last
    weakly-bounded `F.percentile` value-map aggregate — its per-task
    value→count map merges on ONE final reducer, and the lag-seconds
    domain can reach ~1e8 distinct values at 100 TB (not provably
    bounded like w6's quantity or t30's calendar days). The lag
    histogram is now ONE domain-bounded aggregate (map-side combine),
    localCheckpoint'd, and count/min/max plus the two quantiles come
    from `operators/quantiles.py` over it — the dq10 shape. The tail
    assembles driver-side via the audited bounded collects, so the
    all-null empty-input row survives (aggregate-over-empty
    semantics)."""
    from meepo_spark.operators.quantiles import exact_quantiles_cdf
    from meepo_spark.operators.trade_graph import bounded_rows, round_half_up

    e = table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    lags = per_user.filter(
        F.col("t_signup").isNotNull()
        & F.col("t_purchase").isNotNull()
        & (F.col("t_purchase") > F.col("t_signup"))
    ).select(
        (F.unix_timestamp("t_purchase") - F.unix_timestamp("t_signup")).alias("lag_s")
    )
    hist = (
        lags.groupBy("lag_s").agg(F.count(F.lit(1)).alias("c")).localCheckpoint()
    )
    qrows = bounded_rows(
        exact_quantiles_cdf(
            hist, [], "lag_s", {"p50": 0.50, "p90": 0.90},
            weight="c", extrema=True,
        ),
        1,
        "e9 lag quantiles",
    )
    if qrows:
        [q] = qrows
        row = (
            int(q["n"]),
            int(q["lo"]),
            round_half_up(q["p50"], 1),
            round_half_up(q["p90"], 1),
            int(q["hi"]),
        )
    else:  # no conversions: the aggregate-over-empty all-null row
        row = (0, None, None, None, None)
    return spark.createDataFrame(
        [row],
        "n_converted long, min_lag_s long, p50_lag_s double, "
        "p90_lag_s double, max_lag_s long",
    )


@register(
    "e10_sessionization",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us,
               LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
               ) AS prev_us
        FROM events
    ),
    marked AS (
        SELECT *, CASE WHEN prev_us IS NULL
                         OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS is_new
        FROM seq
    ),
    sess AS (
        SELECT *, SUM(is_new) OVER (
            PARTITION BY user_id ORDER BY us, event_id
            ROWS UNBOUNDED PRECEDING) AS session_n
        FROM marked
    )
    SELECT user_id, CAST(session_n AS BIGINT) AS session_n,
           CAST(COUNT(*) AS BIGINT)           AS n_events,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(MAX(us) - MIN(us) AS BIGINT)  AS duration_us
    FROM sess
    GROUP BY user_id, session_n
    """,
)
def e10_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E10: batch sessionization — the 30-minute-gap session cut every
    product-analytics stack runs nightly (the batch twin of the T4
    session WINDOW, which merges by watermark instead of ordinal).
    A new session starts where the per-user inter-event gap exceeds
    30 min; the session ordinal is the running count of starts.

    Scale shape: both windows partition on user_id — the natural
    high-cardinality event-stream key — so each user's timeline sorts
    in its own task and the per-(user, session) rollup partial-
    aggregates map-side. All µs-integer arithmetic: gap test, session
    ordinal, and duration are exact on both engines (the ts ordering
    ties break on event_id, a total order)."""
    us = F.unix_micros(F.col("ts"))
    wo = W.partitionBy("user_id").orderBy(us, "event_id")
    seq = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        us.alias("us"),
        F.lag(us).over(wo).alias("prev_us"),
    )
    marked = seq.withColumn(
        "is_new",
        F.when(
            F.col("prev_us").isNull()
            | (F.col("us") - F.col("prev_us") > 1_800_000_000),
            1,
        ).otherwise(0),
    )
    wrun = (
        W.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    sess = marked.withColumn("session_n", F.sum("is_new").over(wrun))
    return sess.groupBy("user_id", "session_n").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        (F.max("us") - F.min("us")).alias("duration_us"),
    )


@register(
    "e12_activity_streaks",
    oracle="""
    WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    grp AS (
        SELECT user_id, day,
               day - CAST(ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY day) AS INT) AS island
        FROM days
    ),
    streaks AS (
        SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS len
        FROM grp GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(SUM(len) AS BIGINT)   AS n_active_days,
           CAST(MAX(len) AS BIGINT)   AS longest_streak,
           CAST(COUNT(*) AS BIGINT)   AS n_streaks
    FROM streaks
    GROUP BY user_id
    """,
)
def e12_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E12: consecutive-day activity streaks per user — the classic
    gaps-and-islands reduction (engagement/retention's 'current
    streak' metric). day − row_number(day) is constant within each
    unbroken run, so one keyed window + two keyed aggregates solve
    what a self-join formulation makes quadratic.

    Scale shape: everything partitions by user_id (high-cardinality);
    the window input is per-user DISTINCT days (≤ calendar span), and
    both aggregates partial-combine map-side. Integer day arithmetic
    — exact on both engines."""
    days = (
        table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    rn = F.row_number().over(W.partitionBy("user_id").orderBy("day"))
    grp = days.withColumn("island", F.date_sub(F.col("day"), rn))
    streaks = grp.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.sum("len").alias("n_active_days"),
        F.max("len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
    )


@register(
    "t19_cusum_changepoint",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ),
    cum AS (
        SELECT event_type, day, cents,
               CAST(SUM(cents) OVER w AS BIGINT) AS ci,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS ri,
               CAST(SUM(cents) OVER (PARTITION BY event_type) AS BIGINT) AS tot,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS nd
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS UNBOUNDED PRECEDING)
    ),
    dev AS (SELECT event_type, day, nd,
                   nd * ci - ri * tot AS c
            FROM cum)
    SELECT event_type,
           STRFTIME(day, '%Y-%m-%d') AS change_day,
           CAST(ABS(c) AS BIGINT)    AS max_dev_scaled,
           nd                        AS n_days
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                       ORDER BY ABS(c) DESC, day) AS rn
          FROM dev)
    WHERE rn = 1
    """,
)
def t19_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T19: offline CUSUM changepoint detection per event type — the
    day where the cumulative deviation of daily volume-value from the
    series mean peaks (the classic level-shift locator for metric
    regressions). INTEGER-EXACT by scaling: instead of
    cum(x) − i·mean (a float), both engines compare
    C_i = N·cum_i − i·total — the same argmax, in exact 64-bit
    arithmetic.

    Scale shape: daily aggregation is the only fact pass; the per-type
    running sums come from `bucketed_prefix_sum` over 8-day calendar
    bands (window partitions bounded at 8 days; band offsets over a
    ≤⌈days/8⌉-row aggregate) with the per-type totals from the same
    tiny band aggregate — no tiny-key full-frame window, the g11/v13
    discipline. The final argmax is a lexicographic struct-min per
    type."""
    from meepo_spark.operators.enumeration import bucketed_prefix_sum

    daily = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
        )
        .withColumn("one", F.lit(1).cast("long"))
    )
    pre = bucketed_prefix_sum(
        daily,
        bucket=F.floor(F.unix_date(F.col("day")) / 8),
        order_cols=[F.col("day").asc()],
        vals={"ci": "cents", "ri": "one"},
        part_cols=["event_type"],
        frame_end=0,
        totals=True,
    )
    c = F.col("ri_tot") * F.col("ci") - F.col("ri") * F.col("ci_tot")
    dev = pre.select(
        "event_type", "day", F.col("ri_tot").alias("n_days"), c.alias("c")
    )
    best = dev.groupBy("event_type").agg(
        F.min(
            F.struct(
                (-F.abs(F.col("c"))).alias("na"),
                F.col("day").alias("day"),
            )
        ).alias("b"),
        F.max("n_days").alias("n_days"),
    )
    return best.select(
        "event_type",
        F.date_format(F.col("b.day"), "yyyy-MM-dd").alias("change_day"),
        (-F.col("b.na")).cast("long").alias("max_dev_scaled"),
        F.col("n_days").cast("long").alias("n_days"),
    )


@register(
    "e13_windowed_funnel",
    oracle="""
    WITH s AS (
        SELECT user_id,
               MIN(epoch_us(CAST(ts AS TIMESTAMP)))
                   FILTER (WHERE event_type = 'signup') AS t0
        FROM events GROUP BY user_id
    ),
    v AS (
        SELECT e.user_id, MIN(epoch_us(CAST(e.ts AS TIMESTAMP))) AS t1
        FROM events e JOIN s ON s.user_id = e.user_id
        WHERE e.event_type = 'view'
          AND epoch_us(CAST(e.ts AS TIMESTAMP)) > s.t0
          AND epoch_us(CAST(e.ts AS TIMESTAMP)) <= s.t0 + 259200000000
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(epoch_us(CAST(e.ts AS TIMESTAMP))) AS t2
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'purchase'
          AND epoch_us(CAST(e.ts AS TIMESTAMP)) > v.t1
          AND epoch_us(CAST(e.ts AS TIMESTAMP)) <= v.t1 + 259200000000
        GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM s WHERE t0 IS NOT NULL) AS BIGINT) AS n_step1,
           CAST((SELECT COUNT(*) FROM v) AS BIGINT)                      AS n_step2,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT)                      AS n_step3,
           CAST((SELECT SUM(t1 - s.t0) FROM v JOIN s USING (user_id)) AS BIGINT)
               AS total_lag12_us,
           CAST((SELECT SUM(t2 - v.t1) FROM p JOIN v USING (user_id)) AS BIGINT)
               AS total_lag23_us
    """,
)
def e13_windowed_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E13: STRICT time-windowed funnel — signup → first view within
    72 h of the signup → first purchase within 72 h of THAT view.
    Unlike e1's first-touch approximation, each step anchors on the
    previous step's qualifying event, the semantics product analytics
    tools ship as 'conversion window'. Three conditional-MIN
    aggregates chained by user_id equi-joins (each previous-step frame
    is user-grain — broadcastable against the event scan at any
    realistic user count); all comparisons are exact µs integers.

    Scale shape: no sequence explosion, no windows — each step is one
    filtered pass over events joined to a user-grain anchor frame;
    step frames shrink monotonically."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    WIN = 259_200_000_000  # 72 h in µs
    s = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("us"))).alias("t0")
    ).filter(F.col("t0").isNotNull())
    v = (
        ev.filter(F.col("event_type") == "view")
        # s is per-signup-user — DATA-GROWING: size-gated
        .join(maybe_broadcast(s), "user_id")
        .filter((F.col("us") > F.col("t0")) & (F.col("us") <= F.col("t0") + WIN))
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"), F.first("t0").alias("t0"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        # v is per-converted-user — DATA-GROWING: size-gated
        .join(maybe_broadcast(v.select("user_id", "t1")), "user_id")
        .filter((F.col("us") > F.col("t1")) & (F.col("us") <= F.col("t1") + WIN))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"), F.first("t1").alias("t1"))
    )
    counts = (
        s.agg(F.count(F.lit(1)).alias("n_step1"))
        .crossJoin(
            F.broadcast(  # bcast: fixed (1-row counts)
                v.agg(
                    F.count(F.lit(1)).alias("n_step2"),
                    F.sum(F.col("t1") - F.col("t0")).alias("total_lag12_us"),
                )
            )
        )
        .crossJoin(
            F.broadcast(  # bcast: fixed (1-row counts)
                p.agg(
                    F.count(F.lit(1)).alias("n_step3"),
                    F.sum(F.col("t2") - F.col("t1")).alias("total_lag23_us"),
                )
            )
        )
    )
    return counts.select(
        "n_step1", "n_step2", "n_step3", "total_lag12_us", "total_lag23_us"
    )


@register(
    "e14_active_user_ratios",
    oracle="""
    WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ud),
    contrib AS (
        SELECT ud.user_id, ud.day + CAST(t.i AS INT) AS obs_day
        FROM ud CROSS JOIN range(7) t(i)
    ),
    wau AS (
        SELECT obs_day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
        FROM contrib GROUP BY obs_day
    ),
    dau AS (
        SELECT day AS obs_day, CAST(COUNT(*) AS BIGINT) AS dau
        FROM ud GROUP BY day
    )
    SELECT STRFTIME(w.obs_day, '%Y-%m-%d') AS day,
           COALESCE(d.dau, 0)              AS dau,
           w.wau                           AS wau,
           ROUND(COALESCE(d.dau, 0) * 1.0 / w.wau + 1e-9, 4) + 0.0 AS stickiness
    FROM wau w LEFT JOIN dau d ON d.obs_day = w.obs_day
    CROSS JOIN span
    WHERE w.obs_day >= span.d0 + CAST(6 AS INT) AND w.obs_day <= span.d1
    """,
)
def e14_active_user_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E14: DAU / trailing-7-day WAU / stickiness per day — the
    engagement dashboard primitive. The trailing-window DISTINCT is
    the trap: COUNT(DISTINCT) OVER a RANGE frame has no partial
    aggregation. The scale shape used here: reduce to distinct
    (user, day) once, then each user-day CONTRIBUTES itself to the 7
    observation days it covers (a map-side 7× explode of the tiny
    user-day frame), and trailing-distinct becomes a plain
    per-(obs_day) distinct count — partial-aggregated, no window at
    all. First 6 days are dropped (incomplete trailing window).

    The single rounded ratio divides two exact integers."""
    ud = (
        table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    span = ud.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    contrib = ud.select(
        "user_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(6)),
                lambda i: F.date_add(F.col("day"), i),
            )
        ).alias("obs_day"),
    )
    wau = contrib.groupBy("obs_day").agg(
        F.countDistinct("user_id").alias("wau")
    )
    dau = ud.groupBy(F.col("day").alias("obs_day")).agg(
        F.count(F.lit(1)).alias("dau")
    )
    return (
        wau.join(dau, "obs_day", "left")
        .crossJoin(F.broadcast(span))  # bcast: fixed (1-row span)
        .filter(
            (F.col("obs_day") >= F.date_add(F.col("d0"), 6))
            & (F.col("obs_day") <= F.col("d1"))
        )
        .select(
            F.date_format("obs_day", "yyyy-MM-dd").alias("day"),
            F.coalesce("dau", F.lit(0)).alias("dau"),
            "wau",
            (
                F.round(
                    F.coalesce("dau", F.lit(0)) * 1.0 / F.col("wau") + 1e-9, 4
                )
                + 0.0
            ).alias("stickiness"),
        )
    )




# ---- shared Holt machinery (code-review r5e) -------------------------
# t20/t21/t26/t27 all fit exponential-smoothing folds over the SAME
# per-(event_type, day) integer-cents series, and t20/t21/t27 share the
# SAME Holt-linear init/step whose bit-identity across queries their
# oracles rely on. One definition each; a fold fix (e.g. the r4b
# try_element_at NULL-seed) now lands everywhere at once.


def _daily_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(event_type, day) volume-value series in exact integer
    cents, emitted as double for the folds."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("double")
            .alias("x")
        )
    )


# --- Holt smoothing constants: the ONE place α/β live (VERDICT r5
# "what's wrong" #3 / next-round #6). The engine folds below AND all
# four forecast oracles' DuckDB fold SQL are emitted from these, so a
# smoothing change can never desync the two engines — previously the
# literals were repeated in 4+ SQL strings that had to be edited in
# lockstep. 0.5/0.25 (and their complements 0.5/0.75) are binary-exact
# doubles, so repr() round-trips them losslessly into SQL text.
HOLT_ALPHA = 0.5
HOLT_BETA = 0.25  # doubles as the Holt-Winters seasonal gamma
_HA, _HIA = repr(HOLT_ALPHA), repr(1.0 - HOLT_ALPHA)
_HB, _HIB = repr(HOLT_BETA), repr(1.0 - HOLT_BETA)

# Holt-LINEAR fold over a day-ordered series list `xs` → [level,
# trend] as `lb` (t20/t21/t27). DuckDB list_reduce has no init, so the
# seed state [l0, b0] is prepended as the first element and data
# elements are padded to state width (the r4 recipe).
HOLT_FOLD_SQL_LB = """list_reduce(
                   list_prepend([xs[1], xs[2] - xs[1]],
                                list_transform(xs[3:], x -> [x, 0.0::DOUBLE])),
                   (acc, el) -> [
                       {a} * el[1] + {ia} * (acc[1] + acc[2]),
                       {b} * ({a} * el[1] + {ia} * (acc[1] + acc[2]) - acc[1])
                           + {ib} * acc[2]
                   ]) AS lb""".format(a=_HA, ia=_HIA, b=_HB, ib=_HIB)

# Holt-WINTERS (additive, m=7) fold → 9-slot state [l, b, s1..s7] as
# `st` (t26): each step consumes the seasonal queue head acc[3] and
# appends the refreshed season; γ = HOLT_BETA.
HW_FOLD_SQL_ST = """list_reduce(
                   list_prepend(
                       [l0, b0,
                        xs[1] - l0, xs[2] - l0, xs[3] - l0, xs[4] - l0,
                        xs[5] - l0, xs[6] - l0, xs[7] - l0],
                       list_transform(xs[15:], x ->
                           [x, 0.0::DOUBLE, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])),
                   (acc, el) -> list_concat(
                       list_concat(
                           [{a} * (el[1] - acc[3]) + {ia} * (acc[1] + acc[2]),
                            {b} * (({a} * (el[1] - acc[3])
                                     + {ia} * (acc[1] + acc[2])) - acc[1])
                                + {ib} * acc[2]],
                           acc[4:9]),
                       [{b} * (el[1] - ({a} * (el[1] - acc[3])
                                         + {ia} * (acc[1] + acc[2])))
                        + {ib} * acc[3]])) AS st""".format(
    a=_HA, ia=_HIA, b=_HB, ib=_HIB
)


def _holt_init_rest(xs):
    """Holt-linear seed [l0=x1, b0=x2-x1] (try_element_at: a 1-day
    series degrades the trend to NULL like the oracle's xs[2]) and the
    remaining fold input xs[3:]."""
    init = F.array(
        F.element_at(xs, 1),
        F.try_element_at(xs, F.lit(2)) - F.element_at(xs, 1),
    )
    rest = F.slice(xs, 3, F.greatest(F.size(xs) - 2, F.lit(0)))
    return init, rest


def _holt_step(acc, x):
    """One Holt-linear update from HOLT_ALPHA / HOLT_BETA (binary-
    exact; the same constants emit the oracle SQL above). new_b
    repeats the new_l expression tree verbatim so both engines fold
    the identical IEEE operation order."""
    l, b = F.element_at(acc, 1), F.element_at(acc, 2)
    a, ia, bt, ibt = HOLT_ALPHA, 1.0 - HOLT_ALPHA, HOLT_BETA, 1.0 - HOLT_BETA
    new_l = a * x + ia * (l + b)
    new_b = bt * (a * x + ia * (l + b) - l) + ibt * b
    return F.array(new_l, new_b)


@register(
    "t20_holt_linear_forecast",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                    AS DOUBLE) AS x
        FROM events GROUP BY 1, 2
    ),
    series AS (
        SELECT event_type,
               list_transform(LIST({'d': day, 'x': x} ORDER BY day), r -> r.x) AS xs,
               CAST(COUNT(*) AS BIGINT) AS n_days
        FROM daily GROUP BY event_type
    ),
    fitted AS (
        SELECT event_type, n_days,
               """ + HOLT_FOLD_SQL_LB + """
        FROM series
    )
    SELECT event_type, n_days,
           ROUND(lb[1] + 1e-9, 4) + 0.0            AS level_r,
           ROUND(lb[2] + 1e-9, 4) + 0.0            AS trend_r,
           ROUND(lb[1] + 3 * lb[2] + 1e-9, 4) + 0.0 AS forecast3_r
    FROM fitted ORDER BY event_type
    """,
)
def t20_holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T20: Holt double-exponential smoothing per event type — level +
    trend fit of the daily volume-value series and a 3-day-ahead
    forecast. Exponential smoothing is an inherently SEQUENTIAL
    recurrence; the distributed shape is: reduce the fact to the tiny
    per-type daily series (one aggregate), collect each series into
    an ORDERED array, and run the recurrence as a sequential fold
    expression (F.aggregate ≡ DuckDB list_reduce with a [level,
    trend] array accumulator) — per-key folds parallelize across
    keys, and the per-key state is O(1). α=0.5, β=0.25 are
    binary-exact, daily inputs are exact integer cents, and both
    engines fold the same order, so level/trend match bit-for-bit
    before rounding. Init: l₀=x₁, b₀=x₂−x₁ (the standard two-point
    start)."""
    daily = _daily_cents(spark, sf_dir)
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "x"))), lambda r: r["x"]
        ).alias("xs"),
        F.count(F.lit(1)).alias("n_days"),
    )
    xs = F.col("xs")
    # try_element_at: a 1-day series has no x2 — the trend seed (and
    # everything derived from it) degrades to NULL exactly like the
    # oracle's xs[2] -> NULL, instead of ANSI element_at raising
    # (code-review r4b #1)
    init, rest = _holt_init_rest(xs)
    step = _holt_step

    fitted = series.select(
        "event_type",
        "n_days",
        F.aggregate(rest, init, step).alias("lb"),
    )
    lvl, trd = F.element_at("lb", 1), F.element_at("lb", 2)
    return fitted.select(
        "event_type",
        "n_days",
        (F.round(lvl + 1e-9, 4) + 0.0).alias("level_r"),
        (F.round(trd + 1e-9, 4) + 0.0).alias("trend_r"),
        (F.round(lvl + 3 * trd + 1e-9, 4) + 0.0).alias("forecast3_r"),
    ).orderBy("event_type")


@register(
    "e15_growth_accounting",
    oracle="""
    WITH uw AS (
        SELECT DISTINCT user_id,
               CAST(DATE_TRUNC('week', CAST(ts AS DATE)) AS DATE) AS wk
        FROM events
    ),
    flags AS (
        SELECT user_id, wk,
               MIN(wk) OVER (PARTITION BY user_id) AS first_wk,
               LAG(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk
        FROM uw
    ),
    states AS (
        SELECT wk,
               CASE WHEN wk = first_wk THEN 'new'
                    WHEN prev_wk = wk - INTERVAL 7 DAY THEN 'retained'
                    ELSE 'resurrected' END AS state
        FROM flags
    ),
    churn AS (
        SELECT CAST(wk + INTERVAL 7 DAY AS DATE) AS wk, 'churned' AS state
        FROM (
            SELECT user_id, wk,
                   LEAD(wk) OVER (PARTITION BY user_id ORDER BY wk) AS next_wk
            FROM uw
        )
        WHERE next_wk IS DISTINCT FROM wk + INTERVAL 7 DAY
          AND wk + INTERVAL 7 DAY <= (SELECT MAX(wk) FROM uw)
    )
    SELECT STRFTIME(wk, '%Y-%m-%d') AS week, state,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM (SELECT wk, state FROM states UNION ALL SELECT wk, state FROM churn)
    GROUP BY wk, state
    """,
)
def e15_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E15: weekly growth accounting — every active (user, week) is
    NEW (first-ever week), RETAINED (also active the week before) or
    RESURRECTED (returning after a gap), and a user active in week w
    but not w+1 counts as CHURNED in w+1 (capped at the last observed
    week so the open week never reports phantom churn). The
    new/retained/resurrected/churned ledger is THE growth dashboard
    identity: retained(w) − churned(w) telescopes to the active-user
    delta.

    Scale shape: the fact reduces once to distinct (user, week); both
    windows partition on user_id (high-cardinality) over ≤
    weeks-per-user rows; the census is a tiny (week, state)
    aggregate. Integer date arithmetic throughout."""
    uw = (
        table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.date_trunc("week", F.to_date("ts")).cast("date").alias("wk"),
        )
        .distinct()
    )
    wu = W.partitionBy("user_id")
    wo = wu.orderBy("wk")
    flags = uw.select(
        "user_id",
        "wk",
        F.min("wk").over(wu).alias("first_wk"),
        F.lag("wk").over(wo).alias("prev_wk"),
        F.lead("wk").over(wo).alias("next_wk"),
    )
    states = flags.select(
        "wk",
        F.when(F.col("wk") == F.col("first_wk"), "new")
        .when(F.col("prev_wk") == F.date_sub("wk", 7), "retained")
        .otherwise("resurrected")
        .alias("state"),
    )
    max_wk = uw.agg(F.max("wk").alias("max_wk"))
    churn = (
        flags.crossJoin(F.broadcast(max_wk))  # bcast: fixed (1-row max week)
        .filter(
            (
                F.col("next_wk").isNull()
                | (F.col("next_wk") != F.date_add("wk", 7))
            )
            & (F.date_add("wk", 7) <= F.col("max_wk"))
        )
        .select(F.date_add("wk", 7).alias("wk"), F.lit("churned").alias("state"))
    )
    return (
        states.unionByName(churn)
        .groupBy(
            F.date_format("wk", "yyyy-MM-dd").alias("week"), "state"
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "t21_forecast_backtest",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                    AS DOUBLE) AS x
        FROM events GROUP BY 1, 2
    ),
    cutoff AS (SELECT MIN(day) + CAST(19 AS INT) AS cut FROM daily),
    train AS (
        SELECT event_type,
               list_transform(LIST({'d': day, 'x': x} ORDER BY day), r -> r.x) AS xs
        FROM daily CROSS JOIN cutoff WHERE day <= cut GROUP BY event_type
    ),
    fitted AS (
        SELECT event_type,
               """ + HOLT_FOLD_SQL_LB + """
        FROM train
    ),
    holdout AS (
        SELECT d.event_type, d.x,
               CAST(d.day - c.cut AS BIGINT) AS h
        FROM daily d CROSS JOIN cutoff c WHERE d.day > c.cut
    )
    SELECT h.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(list_sum(LIST(ABS(h.x - (f.lb[1] + h.h * f.lb[2])) ORDER BY h.h))
                 / list_sum(LIST(ABS(h.x) ORDER BY h.h))
                 + 1e-9, 6) + 0.0 AS wape_r
    FROM holdout h JOIN fitted f USING (event_type)
    GROUP BY h.event_type ORDER BY h.event_type
    """,
)
def t21_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T21: forecast BACKTEST — fit t20's Holt level+trend on the
    first 20 days per type, project h days ahead over the holdout,
    and score WAPE (Σ|err| / Σ|actual| — the scale-free accuracy
    metric forecast monitoring dashboards page on). Completes the
    fit → forecast → evaluate loop: t20 alone says what the model
    thinks; this says whether to trust it.

    Exactness: same ordered-fold recurrence as t20 (bit-identical
    level/trend on both engines), horizon h is exact integer day
    arithmetic against a broadcast cutoff, each |err| is scalar
    double math on identical inputs, and the WAPE numerator folds as
    a SUM over identical per-day doubles — sum order across ≤10
    holdout days could differ, so errors aggregate per (type, day)
    grain first and the final ratio rounds at 6dp after a sorted
    fold. Scale shape: one daily aggregate, per-type arrays of ≤20
    floats, broadcast fitted state joined to the holdout."""
    daily = _daily_cents(spark, sf_dir)
    cutoff = daily.agg(F.date_add(F.min("day"), 19).alias("cut"))
    train = (
        daily.crossJoin(F.broadcast(cutoff))  # bcast: fixed (1-row cutoff)
        .filter(F.col("day") <= F.col("cut"))
        .groupBy("event_type")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("day", "x"))), lambda r: r["x"]
            ).alias("xs")
        )
    )
    xs = F.col("xs")
    init, rest = _holt_init_rest(xs)
    step = _holt_step

    fitted = train.select(
        "event_type", F.aggregate(rest, init, step).alias("lb")
    )
    holdout = (
        daily.crossJoin(F.broadcast(cutoff))  # bcast: fixed (1-row cutoff)
        .filter(F.col("day") > F.col("cut"))
        .select(
            "event_type",
            "x",
            F.datediff("day", F.col("cut")).cast("long").alias("h"),
        )
    )
    j = holdout.join(F.broadcast(fitted), "event_type")  # bcast: fixed (per-event-type params)
    err = F.abs(
        F.col("x") - (F.element_at("lb", 1) + F.col("h") * F.element_at("lb", 2))
    )
    folded = j.select("event_type", "h", err.alias("e"), F.abs("x").alias("ax")).groupBy(
        "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("h", F.col("e").alias("v")))),
            F.lit(0.0),
            lambda acc, s: acc + s["v"],
        ).alias("sum_err"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("h", F.col("ax").alias("v")))),
            F.lit(0.0),
            lambda acc, s: acc + s["v"],
        ).alias("sum_ax"),
    )
    return folded.select(
        "event_type",
        "n_days",
        (
            F.round(F.col("sum_err") / F.col("sum_ax") + 1e-9, 6) + 0.0
        ).alias("wape_r"),
    ).orderBy("event_type")


@register(
    "e16_time_to_convert",
    oracle="""
    WITH fv AS (
        SELECT user_id, MIN(ts) AS fv
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    fp AS (
        SELECT e.user_id, MIN(e.ts) AS fp, MIN(f.fv) AS fv
        FROM events e JOIN fv f ON e.user_id = f.user_id
        WHERE e.event_type = 'purchase' AND e.ts > f.fv
        GROUP BY e.user_id
    ),
    d AS (
        SELECT STRFTIME(date_trunc('week', fv), '%Y-%m-%d') AS cohort_week,
               date_diff('microsecond', fv, fp) AS delay_us
        FROM fp
    )
    SELECT cohort_week,
           COUNT(*)                                        AS n_converted,
           CAST(quantile_disc(delay_us, 0.5) AS BIGINT)    AS p50_delay_us,
           CAST(quantile_disc(delay_us, 0.9) AS BIGINT)    AS p90_delay_us,
           CAST(MAX(delay_us) AS BIGINT)                   AS max_delay_us
    FROM d GROUP BY cohort_week
    """,
)
def e16_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E16: funnel latency — time from a user's FIRST view to their
    first subsequent purchase, summarized per first-view cohort week
    with exact discrete percentiles over integer microsecond delays
    (percentile_disc ≡ DuckDB quantile_disc lower-bound convention;
    no interpolation, no float drift). Complements e9 (per-conversion
    lag) with the user-grain first-touch metric growth teams track.

    Scale shape: two hash aggregates on user_id and one equi-join on
    the same key (co-partitioned — no extra exchange after the first
    shuffle). Optimization r11 (VERDICT r10 #3): percentile_disc's
    per-task value→count map merged one reducer per cohort over
    near-unique microsecond delays — user-grain state, the same
    weakly-bounded class as e9's lag percentile. The user-grain
    (cohort, delay) frame is materialized once and the discrete
    quantiles come from `exact_quantiles_disc` (operators/quantiles
    .py, census+refine over 2^30-us ≈ 18-min buckets — calendar ×
    ~600 census rows); count/max reduce off the same checkpoint."""
    from meepo_spark.operators.quantiles import exact_quantiles_disc

    e = table(spark, sf_dir, "events")
    fv = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fv"))
    )
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .filter(F.col("ts") > F.col("fv"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("fp"), F.min("fv").alias("fv"))
    )
    d = fp.select(
        F.date_format(F.date_trunc("week", "fv"), "yyyy-MM-dd").alias("cohort_week"),
        (F.unix_micros("fp") - F.unix_micros("fv")).alias("delay_us"),
    ).localCheckpoint()
    qf = exact_quantiles_disc(
        d,
        ["cohort_week"],
        "delay_us",
        {"p50": 0.50, "p90": 0.90},
        bucket_width=float(2**30),
        extrema=True,
    )
    return qf.select(  # calendar-week-grain local relation
        "cohort_week",
        F.col("n").alias("n_converted"),
        F.col("p50").cast("long").alias("p50_delay_us"),
        F.col("p90").cast("long").alias("p90_delay_us"),
        F.col("hi").cast("long").alias("max_delay_us"),
    )


@register(
    "t25_m4_downsample",
    oracle="""
    WITH e AS (
        SELECT event_type,
               CAST(DATE_TRUNC('week', CAST(ts AS DATE)) AS DATE) AS wk,
               ts, event_id, value
        FROM events
    ),
    ranked AS (
        SELECT event_type, wk, value,
               ROW_NUMBER() OVER (PARTITION BY event_type, wk
                                  ORDER BY ts ASC, event_id ASC)  AS r_first,
               ROW_NUMBER() OVER (PARTITION BY event_type, wk
                                  ORDER BY ts DESC, event_id DESC) AS r_last
        FROM e
    )
    SELECT event_type,
           STRFTIME(wk, '%Y-%m-%d')                              AS week,
           CAST(COUNT(*) AS BIGINT)                              AS n,
           ROUND(MIN(value), 6) + 0.0                            AS min_v,
           ROUND(MAX(value), 6) + 0.0                            AS max_v,
           ROUND(MAX(CASE WHEN r_first = 1 THEN value END), 6) + 0.0 AS first_v,
           ROUND(MAX(CASE WHEN r_last  = 1 THEN value END), 6) + 0.0 AS last_v
    FROM ranked
    GROUP BY event_type, wk
    """,
)
def t25_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T25: M4 downsampling (Jugel et al., VLDB 2014) — per pixel-
    column bucket (here: event_type x calendar week) emit the FOUR
    values that make a line chart of any width render pixel-exact:
    min, max, first (by event time), last. The canonical dashboard
    query over a 100 TB event log: one scan, one hash aggregate keyed
    by (series, bucket) — min/max are plain aggregates and first/last
    are min_by/max_by over the (ts, event_id) total order, so there is
    NO window over an unbounded partition and no sort; output size is
    4 points x #buckets, independent of input rows. The oracle mirrors
    first/last with ranked windows (DuckDB arg_min/arg_max take no
    composite key)."""
    e = table(spark, sf_dir, "events")
    b = e.select(
        "event_type",
        F.date_trunc("week", F.col("ts").cast("date")).cast("date").alias("wk"),
        "ts",
        "event_id",
        "value",
    )
    key = F.struct("ts", "event_id")
    return (
        b.groupBy("event_type", "wk")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.round(F.min("value"), 6) + 0.0).alias("min_v"),
            (F.round(F.max("value"), 6) + 0.0).alias("max_v"),
            (F.round(F.min_by("value", key), 6) + 0.0).alias("first_v"),
            (F.round(F.max_by("value", key), 6) + 0.0).alias("last_v"),
        )
        .select(
            "event_type",
            F.date_format("wk", "yyyy-MM-dd").alias("week"),
            "n",
            "min_v",
            "max_v",
            "first_v",
            "last_v",
        )
    )


@register(
    "t26_holt_winters_seasonal",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                    AS DOUBLE) AS x
        FROM events GROUP BY 1, 2
    ),
    series AS (
        SELECT event_type,
               list_transform(LIST({'d': day, 'x': x} ORDER BY day), r -> r.x) AS xs,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               DATE_DIFF('day', MIN(day), MAX(day)) + 1 AS span_days
        FROM daily GROUP BY event_type
    ),
    seeded AS (
        SELECT event_type, n_days, xs,
               list_sum(xs[1:7]) / 7.0 AS l0,
               (list_sum(xs[8:14]) / 7.0 - list_sum(xs[1:7]) / 7.0) / 7.0 AS b0
        FROM series
        WHERE n_days >= 15 AND n_days = span_days
    ),
    fitted AS (
        SELECT event_type, n_days,
               """ + HW_FOLD_SQL_ST + """
        FROM seeded
    )
    SELECT event_type, n_days,
           ROUND(st[1] + 1e-9, 4) + 0.0                     AS level_r,
           ROUND(st[2] + 1e-9, 4) + 0.0                     AS trend_r,
           ROUND(st[5] + 1e-9, 4) + 0.0                     AS season3_r,
           ROUND(st[1] + 3 * st[2] + st[5] + 1e-9, 4) + 0.0 AS forecast3_r
    FROM fitted ORDER BY event_type
    """,
)
def t26_holt_winters_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T26: Holt–Winters TRIPLE exponential smoothing (additive,
    weekly season m=7) per event type — t20's level+trend recurrence
    extended with a rotating 7-slot seasonal queue, still expressed
    as one sequential fold: state = [level, trend, s(t-m+1..t)] and
    each step consumes the queue head (the season due NOW) and
    appends the refreshed one. Seeds: l0 = mean of week 1, b0 =
    (mean week 2 − mean week 1)/7, s_i = x_i − l0; the fold runs
    from day 15. α=0.5, β=γ=0.25 are binary-exact and both engines
    fold the identical expression tree over the identical day order,
    so state matches bit-for-bit before rounding (inputs are exact
    integer cents). The 3-day forecast re-adds the matching seasonal
    (queue slot 3). Scale: the fact collapses to per-(type, day)
    cells first; per-key state is O(m); folds parallelize across
    keys — the same recurrence-as-ordered-fold discipline as
    t19/t20, never a driver loop."""
    daily = _daily_cents(spark, sf_dir)
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "x"))), lambda r: r["x"]
        ).alias("xs"),
        F.count(F.lit(1)).alias("n_days"),
        (F.datediff(F.max("day"), F.min("day")) + 1).alias("span_days"),
    )
    xs = F.col("xs")
    wk = lambda a, b: F.aggregate(  # noqa: E731
        F.slice(xs, a, b), F.lit(0.0), lambda acc, x: acc + x
    )
    # dense-calendar guard (code-review r5c): the m=7 rotation indexes
    # OBSERVED days, so one missing (type, day) cell would shift every
    # later step off weekday phase — both engines would compute the
    # identical wrong thing and the grade would still pass. A sparse
    # series is excluded rather than silently mis-seasoned (a gap-fill
    # spine, t8 style, is the production fix).
    seeded = series.filter(
        (F.col("n_days") >= 15) & (F.col("n_days") == F.col("span_days"))
    ).select(
        "event_type",
        "n_days",
        "xs",
        (wk(1, 7) / 7.0).alias("l0"),
        ((wk(8, 7) / 7.0 - wk(1, 7) / 7.0) / 7.0).alias("b0"),
    )
    l0, b0 = F.col("l0"), F.col("b0")
    init = F.concat(
        F.array(l0, b0),
        F.transform(F.slice(xs, 1, 7), lambda x: x - l0),
    )
    rest = F.slice(xs, 15, F.greatest(F.size(xs) - 14, F.lit(0)))

    def step(acc, x):
        l = F.element_at(acc, 1)
        b = F.element_at(acc, 2)
        s_old = F.element_at(acc, 3)
        a, ia = HOLT_ALPHA, 1.0 - HOLT_ALPHA
        g, ig = HOLT_BETA, 1.0 - HOLT_BETA  # β and γ share the constant
        new_l = a * (x - s_old) + ia * (l + b)
        new_b = g * ((a * (x - s_old) + ia * (l + b)) - l) + ig * b
        new_s = g * (x - (a * (x - s_old) + ia * (l + b))) + ig * s_old
        return F.concat(F.array(new_l, new_b), F.slice(acc, 4, 6), F.array(new_s))

    fitted = seeded.select(
        "event_type",
        "n_days",
        F.aggregate(rest, init, step).alias("st"),
    )
    lvl = F.element_at("st", 1)
    trd = F.element_at("st", 2)
    s3 = F.element_at("st", 5)
    return fitted.select(
        "event_type",
        "n_days",
        (F.round(lvl + 1e-9, 4) + 0.0).alias("level_r"),
        (F.round(trd + 1e-9, 4) + 0.0).alias("trend_r"),
        (F.round(s3 + 1e-9, 4) + 0.0).alias("season3_r"),
        (F.round(lvl + 3 * trd + s3 + 1e-9, 4) + 0.0).alias("forecast3_r"),
    ).orderBy("event_type")


@register(
    "t27_mase_forecast_eval",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                    AS DOUBLE) AS x
        FROM events GROUP BY 1, 2
    ),
    cutoff AS (SELECT MIN(day) + CAST(19 AS INT) AS cut FROM daily),
    train AS (
        SELECT event_type,
               list_transform(LIST({'d': day, 'x': x} ORDER BY day), r -> r.x) AS xs
        FROM daily CROSS JOIN cutoff WHERE day <= cut GROUP BY event_type
    ),
    fitted AS (
        SELECT event_type,
               """ + HOLT_FOLD_SQL_LB + """
        FROM train
    ),
    holdout AS (
        SELECT d.event_type, d.day, d.x,
               CAST(d.day - c.cut AS BIGINT) AS h
        FROM daily d CROSS JOIN cutoff c
        WHERE d.day > c.cut AND d.day - c.cut <= 7
    ),
    scored AS (
        SELECT ho.event_type, ho.h,
               ABS(ho.x - (f.lb[1] + ho.h * f.lb[2])) AS err_model,
               ABS(ho.x - lag7.x)                     AS err_naive
        FROM holdout ho
        JOIN fitted f USING (event_type)
        JOIN daily lag7 ON lag7.event_type = ho.event_type
                       AND lag7.day = ho.day - 7
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(list_sum(LIST(err_model ORDER BY h))
                 / list_sum(LIST(err_naive ORDER BY h)) + 1e-9, 6) + 0.0
               AS mase_r,
           (list_sum(LIST(err_model ORDER BY h))
            < list_sum(LIST(err_naive ORDER BY h))) AS beats_naive
    FROM scored GROUP BY event_type ORDER BY event_type
    """,
)
def t27_mase_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T27: MASE — the forecast-review gate t21's WAPE doesn't answer:
    is the fitted model better than the SEASONAL-NAIVE baseline
    (predict x[d-7])? MASE = Σ|model err| / Σ|naive err| over the same
    7-day holdout; beats_naive is the boolean a forecast-promotion
    pipeline actually branches on (a model with great-looking WAPE on
    a stable series can still lose to naive — the standard Hyndman
    critique). Same exactness discipline as t21: bit-identical Holt
    fold, integer-day horizons against a broadcast cutoff, per-day
    errors computed on identical doubles, and the two MAE folds sum in
    explicit h order before the one rounded division. Scale: one
    daily aggregate, an equi-join back to lag-7 actuals keyed on
    (type, day), per-type O(holdout) state."""
    daily = _daily_cents(spark, sf_dir)
    cutoff = daily.agg(F.date_add(F.min("day"), 19).alias("cut"))
    train = (
        daily.crossJoin(F.broadcast(cutoff))  # bcast: fixed (1-row cutoff)
        .filter(F.col("day") <= F.col("cut"))
        .groupBy("event_type")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("day", "x"))),
                lambda r: r["x"],
            ).alias("xs")
        )
    )
    xs = F.col("xs")
    init, rest = _holt_init_rest(xs)
    step = _holt_step

    fitted = train.select(
        "event_type", F.aggregate(rest, init, step).alias("lb")
    )
    holdout = (
        daily.crossJoin(F.broadcast(cutoff))  # bcast: fixed (1-row cutoff)
        .filter(
            (F.col("day") > F.col("cut"))
            & (F.datediff(F.col("day"), F.col("cut")) <= 7)
        )
        .select(
            "event_type",
            "day",
            "x",
            F.datediff(F.col("day"), F.col("cut")).cast("long").alias("h"),
        )
    )
    lag7 = daily.select(
        F.col("event_type").alias("l_type"),
        F.col("day").alias("l_day"),
        F.col("x").alias("x_lag7"),
    )
    scored = (
        holdout.join(F.broadcast(fitted), "event_type")  # bcast: fixed (per-event-type params)
        .join(
            lag7,
            (F.col("l_type") == F.col("event_type"))
            & (F.col("l_day") == F.date_sub(F.col("day"), 7)),
        )
        .select(
            "event_type",
            "h",
            F.abs(
                F.col("x")
                - (F.element_at("lb", 1) + F.col("h") * F.element_at("lb", 2))
            ).alias("err_model"),
            F.abs(F.col("x") - F.col("x_lag7")).alias("err_naive"),
        )
    )
    fold = lambda c: F.aggregate(  # noqa: E731
        F.transform(
            F.array_sort(F.collect_list(F.struct("h", c))), lambda r: r[c]
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            fold("err_model").alias("s_model"),
            fold("err_naive").alias("s_naive"),
        )
        .select(
            "event_type",
            "n_days",
            (F.round(F.col("s_model") / F.col("s_naive") + 1e-9, 6) + 0.0).alias(
                "mase_r"
            ),
            (F.col("s_model") < F.col("s_naive")).alias("beats_naive"),
        )
        .orderBy("event_type")
    )


@register(
    "t28_seasonal_decomposition",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                    AS DOUBLE) AS x
        FROM events GROUP BY 1, 2
    ),
    series AS (
        SELECT event_type,
               list_transform(LIST({'d': day, 'x': x} ORDER BY day), r -> r.x) AS xs,
               list_transform(LIST({'d': day, 'x': x} ORDER BY day), r -> r.d) AS ds
        FROM daily GROUP BY event_type
    ),
    flat AS (
        SELECT event_type, m.wd AS wd, m.d AS d
        FROM (
            SELECT event_type,
                   unnest(list_transform(range(4, len(xs) - 2), i ->
                       {'wd': isodow(ds[i]) - 1,
                        'd': xs[i] - list_sum(xs[i-3:i+3]) / 7.0})) AS m
            FROM series WHERE len(xs) >= 7
        )
    ),
    seas AS (
        SELECT event_type, wd, AVG(d) AS s, CAST(COUNT(*) AS BIGINT) AS n_obs
        FROM flat GROUP BY 1, 2
    ),
    j AS (
        SELECT f.event_type, f.d, f.d - s.s AS r
        FROM flat f JOIN seas s USING (event_type, wd)
    ),
    tv AS (
        SELECT event_type,
               SUM(d * d) / COUNT(*) - (SUM(d) / COUNT(*)) * (SUM(d) / COUNT(*))
                   AS var_d,
               SUM(r * r) / COUNT(*) - (SUM(r) / COUNT(*)) * (SUM(r) / COUNT(*))
                   AS var_r
        FROM j GROUP BY 1
    )
    SELECT s.event_type,
           CAST(s.wd AS BIGINT)                              AS weekday,
           s.n_obs,
           ROUND(s.s + 1e-9, 4) + 0.0                        AS seasonal_r,
           ROUND(1 - tv.var_r / tv.var_d + 1e-9, 4) + 0.0    AS strength_r
    FROM seas s JOIN tv USING (event_type)
    """,
)
def t28_seasonal_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T28: classical additive seasonal decomposition per event type —
    trend = centered 7-day moving average, seasonal = mean detrended
    value per weekday, seasonal STRENGTH = 1 − var(residual)/
    var(detrended) (the Hyndman measure every capacity-planning
    dashboard uses to decide 'is this series weekly-seasonal enough to
    forecast with t26's Holt-Winters?').

    Engine shape: the t-family ordered-array discipline — one
    collect_list per (event_type) (≤ calendar-days rows), the centered
    MA as a JVM-side fold over each array slice (list_sum ≡
    F.aggregate 0.0-init fold, the bit-match pair), NO per-type window
    (the r3 tiny-key single-task class this family avoids by
    construction). Weekday convention: Spark F.weekday == DuckDB
    isodow−1 (Monday=0) — F.dayofweek/dayofweek DIFFER across the
    engines (Sunday=1 vs Sunday=0) and would silently rotate the
    season. Cents are exact integers in double; the 7-day mean divides
    once; averages/variances round at 4dp with the 1e-9 nudge and
    +0.0 (sum-order drift ~1e-12, negative-zero guard)."""
    daily = _daily_cents(spark, sf_dir)
    series = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "x"))).alias("dx")
    )
    xs = F.transform("dx", lambda r: r["x"])
    ds = F.transform("dx", lambda r: r["day"])
    n = F.size("dx")
    trend = lambda i: (  # noqa: E731
        F.aggregate(F.slice(xs, i - 3, 7), F.lit(0.0), lambda a, v: a + v) / 7.0
    )
    flat = (
        series.filter(n >= 7)
        .select(
            "event_type",
            F.explode(
                F.transform(
                    F.sequence(F.lit(4), n - 3),
                    lambda i: F.struct(
                        F.weekday(F.element_at(ds, i)).alias("wd"),
                        (F.element_at(xs, i) - trend(i)).alias("d"),
                    ),
                )
            ).alias("m"),
        )
        .select("event_type", "m.wd", "m.d")
    )
    seas = flat.groupBy("event_type", "wd").agg(
        F.avg("d").alias("s"), F.count(F.lit(1)).alias("n_obs")
    )
    j = flat.join(F.broadcast(seas), ["event_type", "wd"]).select(  # bcast: fixed (type x weekday grid)
        "event_type", "d", (F.col("d") - F.col("s")).alias("r")
    )
    cnt = F.count(F.lit(1))
    tv = j.groupBy("event_type").agg(
        (
            F.sum(F.col("d") * F.col("d")) / cnt
            - (F.sum("d") / cnt) * (F.sum("d") / cnt)
        ).alias("var_d"),
        (
            F.sum(F.col("r") * F.col("r")) / cnt
            - (F.sum("r") / cnt) * (F.sum("r") / cnt)
        ).alias("var_r"),
    )
    return seas.join(F.broadcast(tv), "event_type").select(  # bcast: fixed (per-event-type stats)
        "event_type",
        F.col("wd").cast("long").alias("weekday"),
        "n_obs",
        (F.round(F.col("s") + 1e-9, 4) + 0.0).alias("seasonal_r"),
        (F.round(1 - F.col("var_r") / F.col("var_d") + 1e-9, 4) + 0.0).alias(
            "strength_r"
        ),
    )


@register(
    "e17_stickiness",
    oracle="""
    WITH d AS (
        SELECT STRFTIME(date_trunc('month', ts), '%Y-%m') AS month,
               CAST(ts AS DATE) AS day, user_id
        FROM events
    ),
    dau AS (
        SELECT month, day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
        FROM d GROUP BY 1, 2
    ),
    mau AS (
        SELECT month, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
        FROM d GROUP BY 1
    )
    SELECT month,
           CAST(COUNT(*) AS BIGINT)        AS n_days,
           CAST(SUM(dau) AS BIGINT)        AS user_days,
           ANY_VALUE(mau)                  AS mau,
           ROUND(SUM(dau) * 1.0 / COUNT(*) / ANY_VALUE(mau) + 1e-9, 4)
                                           AS stickiness
    FROM dau JOIN mau USING (month)
    GROUP BY month
    """,
)
def e17_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E17: DAU/MAU stickiness per month — the engagement ratio every
    product dashboard headline carries (avg daily actives over monthly
    actives; 1.0 = every monthly user shows up every day).

    Scale shape: two distinct-count aggregates over (month, day,
    user) / (month, user) — both map-side combined, shuffles keyed on
    the date grain, never a window; the month-level join is a
    fixed-size calendar frame. Integer user counts are exact; the one
    ratio divides exact integers and rounds at 4dp."""
    e = table(spark, sf_dir, "events")
    d = e.select(
        F.date_format("ts", "yyyy-MM").alias("month"),
        F.to_date("ts").alias("day"),
        "user_id",
    )
    dau = d.groupBy("month", "day").agg(
        F.countDistinct("user_id").cast("long").alias("dau")
    )
    mau = d.groupBy("month").agg(
        F.countDistinct("user_id").cast("long").alias("mau")
    )
    return (
        dau.join(F.broadcast(mau), "month")  # bcast: fixed (calendar months)
        .groupBy("month")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("dau").cast("long").alias("user_days"),
            F.any_value("mau").alias("mau"),
            F.round(
                F.sum("dau") * 1.0 / F.count(F.lit(1)) / F.any_value("mau") + 1e-9,
                4,
            ).alias("stickiness"),
        )
    )


@register(
    "t29_autocorrelation",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                    AS DOUBLE) AS x
        FROM events GROUP BY 1, 2
    ),
    series AS (
        SELECT event_type,
               list_transform(LIST({'d': day, 'x': x} ORDER BY day), r -> r.x) AS xs
        FROM daily GROUP BY event_type
    ),
    with_m AS (
        SELECT event_type, xs, len(xs) AS n,
               list_sum(xs) / len(xs) AS m
        FROM series WHERE len(xs) > 8
    ),
    stats AS (
        SELECT event_type, xs, n, m,
               list_sum(list_transform(xs, x -> (x - m) * (x - m))) AS denom
        FROM with_m
    )
    SELECT event_type,
           CAST(lag AS BIGINT) AS lag,
           CAST(n AS BIGINT)   AS n_days,
           ROUND(list_sum(list_transform(
                     list_zip(xs[1:n - lag], xs[1 + lag:n]),
                     p -> (p[1] - m) * (p[2] - m))) / denom + 1e-9, 4) + 0.0
               AS acf_r
    FROM stats, unnest(range(1, 8)) AS t(lag)
    """,
)
def t29_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T29: sample autocorrelation function at lags 1–7 per event type
    — the series-diagnosis step BEFORE t26/t28 (a spike at lag 7 says
    'weekly seasonal: fit Holt-Winters', fast decay says 'Holt linear
    is enough'; the standard Box-Jenkins identification read).
    r_k = Σ(x_i−m)(x_{i+k}−m) / Σ(x_i−m)² with the full-series mean m.

    Engine shape: the t-family ordered-array discipline — per-type
    series arrays, lag products as zip_with folds over shifted slices
    (≡ DuckDB list_zip + list_transform + list_sum, the bit-match
    pair), 7 lags exploded from a literal sequence; no windows, no
    re-scan per lag. Cents are exact integers in double; m and the
    final ratio divide once each; 4dp rounding + 1e-9 + (+0.0)
    absorbs the ~1e-12 drift and negative zero."""
    daily = _daily_cents(spark, sf_dir)
    series = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "x"))).alias("dx")
    )
    xs = F.transform("dx", lambda r: r["x"])
    n = F.size("dx")
    fold = lambda arr: F.aggregate(arr, F.lit(0.0), lambda a, v: a + v)  # noqa: E731
    stats = (
        series.filter(n > 8)
        .select("event_type", xs.alias("xs"), n.alias("n"))
        .withColumn("m", fold(F.col("xs")) / F.col("n"))
        .withColumn(
            "denom",
            fold(
                F.transform(
                    "xs", lambda x: (x - F.col("m")) * (x - F.col("m"))
                )
            ),
        )
    )
    lagged = stats.select(
        "event_type", "xs", "n", "m", "denom",
        F.explode(F.sequence(F.lit(1), F.lit(7))).alias("lag"),
    )
    num = fold(
        F.zip_with(
            F.slice("xs", 1, F.col("n") - F.col("lag")),
            F.slice("xs", F.col("lag") + 1, F.col("n") - F.col("lag")),
            lambda a, b: (a - F.col("m")) * (b - F.col("m")),
        )
    )
    return lagged.select(
        "event_type",
        F.col("lag").cast("long").alias("lag"),
        F.col("n").cast("long").alias("n_days"),
        (F.round(num / F.col("denom") + 1e-9, 4) + 0.0).alias("acf_r"),
    )


@register(
    "e18_pareto_concentration",
    oracle="""
    WITH v AS (
        SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS vol
        FROM events GROUP BY 1, 2
    ),
    ranked AS (
        SELECT event_type, vol,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY vol DESC, user_id ASC) AS r
        FROM v
    ),
    sized AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(vol) AS BIGINT) AS total,
               CAST(CEIL(COUNT(*) / 10.0) AS BIGINT) AS k
        FROM ranked GROUP BY 1
    )
    SELECT s.event_type, s.n_users, s.k, s.total,
           CAST(SUM(CASE WHEN r.r <= s.k THEN r.vol ELSE 0 END) AS BIGINT)
               AS top_decile_events,
           ROUND(SUM(CASE WHEN r.r <= s.k THEN r.vol ELSE 0 END) * 1.0
                 / s.total + 1e-9, 4) AS top_decile_share
    FROM ranked r JOIN sized s USING (event_type)
    GROUP BY s.event_type, s.n_users, s.k, s.total
    """,
)
def e18_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E18: Pareto concentration — what share of each event type's
    volume the top decile of its users generates (the '80/20' health
    metric behind abuse screens, whale dashboards, and sampling-bias
    checks; g25's Gini is the integral, this is the operating point).

    Scale shape: user volumes are one hash aggregate; the per-type
    ranking runs through the bucketed-enumeration discipline
    (operators/enumeration.bucketed_row_number, bucket = the volume
    value itself descending — distinct volumes are a bounded grid,
    executor-guarded at MAX_BUCKETS) so no event type's full user
    dimension ever sorts in one task, while the oracle's window
    states the same semantics declaratively. Integer counts exact;
    one share division rounds at 4dp."""
    from meepo_spark.operators.enumeration import bucketed_row_number

    v = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("vol"))
    )
    ranked = bucketed_row_number(
        v,
        F.col("vol"),
        [F.col("vol").desc(), F.col("user_id").asc()],
        part_cols=("event_type",),
        out="r",
        bucket_asc=False,
    )
    sized = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("vol").cast("long").alias("total"),
        F.ceil(F.count(F.lit(1)) / 10.0).cast("long").alias("k"),
    )
    top = F.when(F.col("r") <= F.col("k"), F.col("vol")).otherwise(F.lit(0))
    return (
        ranked.join(F.broadcast(sized), "event_type")  # bcast: fixed (per-event-type totals)
        .groupBy("event_type", "n_users", "k", "total")
        .agg(
            F.sum(top).cast("long").alias("top_decile_events"),
            F.round(F.sum(top) * 1.0 / F.col("total") + 1e-9, 4).alias(
                "top_decile_share"
            ),
        )
    )


@register(
    "t30_seasonal_anomaly",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                    AS DOUBLE) AS x
        FROM events GROUP BY 1, 2
    ),
    series AS (
        SELECT event_type,
               list_transform(LIST({'d': day, 'x': x} ORDER BY day), r -> r.x) AS xs,
               list_transform(LIST({'d': day, 'x': x} ORDER BY day), r -> r.d) AS ds
        FROM daily GROUP BY event_type
    ),
    flat AS (
        SELECT event_type, m.day AS day, m.wd AS wd, m.d AS d
        FROM (
            SELECT event_type,
                   unnest(list_transform(range(4, len(xs) - 2), i ->
                       {'day': ds[i],
                        'wd': isodow(ds[i]) - 1,
                        'd': xs[i] - list_sum(xs[i-3:i+3]) / 7.0})) AS m
            FROM series WHERE len(xs) >= 7
        )
    ),
    seas AS (
        SELECT event_type, wd, AVG(d) AS s FROM flat GROUP BY 1, 2
    ),
    resid AS (
        SELECT f.event_type, f.day, f.d - s.s AS r
        FROM flat f JOIN seas s USING (event_type, wd)
    ),
    st AS (
        SELECT event_type, quantile_cont(r, 0.5) AS med
        FROM resid GROUP BY event_type
    ),
    dev AS (
        SELECT r.event_type, r.day, ABS(r.r - st.med) AS dev
        FROM resid r JOIN st USING (event_type)
    ),
    sig AS (
        SELECT event_type, 1.4826 * quantile_cont(dev, 0.5) AS sigma
        FROM dev GROUP BY event_type
    ),
    scored AS (
        SELECT d.event_type, d.day,
               CASE WHEN sig.sigma = 0 THEN 0.0
                    ELSE ROUND(d.dev / sig.sigma + 1e-9, 4) + 0.0
               END AS score_r
        FROM dev d JOIN sig USING (event_type)
    ),
    agg AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(CASE WHEN score_r > 3.0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_anomalies,
               MAX({'s': score_r, 'd': day}) AS w
        FROM scored GROUP BY event_type
    )
    SELECT event_type, n_days, n_anomalies,
           STRFTIME(w.d, '%Y-%m-%d') AS worst_day,
           w.s AS worst_score_r
    FROM agg
    """,
)
def t30_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T30: seasonal-residual anomaly census — the detection pass t28's
    decomposition exists to feed: weekday-adjust each interior day
    (d − seasonal), then flag days whose |residual − median| exceeds
    3 robust sigmas (1.4826·MAD — median/MAD, not mean/stddev, so the
    anomalies being hunted can't inflate their own threshold, the same
    robustness argument as dq10's Tukey fences vs dq4's z-score).
    Reports per type: evaluated days, anomaly count, and the worst
    day+score.

    Engine shape: t28's ordered-array discipline for trend (one
    collect_list per type, JVM slice-fold MA, no per-type window);
    median and MAD as exact F.percentile over the per-type residual
    frame (≤ calendar-days rows per type — two tiny grouped
    aggregates, not windows). Anomaly threshold compares the ROUNDED
    score (4dp, +1e-9 nudge) on both engines, so the boolean census
    can't flake on the ~1e-12 seasonal-mean drift; worst-day ties
    break on (score_r, day) struct order — a total order, stable
    cross-engine. Dates render as strings (the FIXTURES.md timestamp
    rule)."""
    daily = _daily_cents(spark, sf_dir)
    series = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "x"))).alias("dx")
    )
    xs = F.transform("dx", lambda r: r["x"])
    ds = F.transform("dx", lambda r: r["day"])
    n = F.size("dx")
    trend = lambda i: (  # noqa: E731
        F.aggregate(F.slice(xs, i - 3, 7), F.lit(0.0), lambda a, v: a + v) / 7.0
    )
    flat = (
        series.filter(n >= 7)
        .select(
            "event_type",
            F.explode(
                F.transform(
                    F.sequence(F.lit(4), n - 3),
                    lambda i: F.struct(
                        F.element_at(ds, i).alias("day"),
                        F.weekday(F.element_at(ds, i)).alias("wd"),
                        (F.element_at(xs, i) - trend(i)).alias("d"),
                    ),
                )
            ).alias("m"),
        )
        .select("event_type", "m.day", "m.wd", "m.d")
    )
    seas = flat.groupBy("event_type", "wd").agg(F.avg("d").alias("s"))
    resid = flat.join(F.broadcast(seas), ["event_type", "wd"]).select(  # bcast: fixed (type x weekday grid)
        "event_type", "day", (F.col("d") - F.col("s")).alias("r")
    )
    st = resid.groupBy("event_type").agg(
        F.percentile("r", F.lit(0.5)).alias("med")
    )
    dev = resid.join(F.broadcast(st), "event_type").select(  # bcast: fixed (1 row per event type)
        "event_type", "day", F.abs(F.col("r") - F.col("med")).alias("dev")
    )
    sig = dev.groupBy("event_type").agg(
        (1.4826 * F.percentile("dev", F.lit(0.5))).alias("sigma")
    )
    # sigma == 0 (a type whose deviations are >=50% exactly zero — e.g.
    # exactly 7 days of data leaves ONE interior day with residual 0)
    # must not divide: Spark gives NaN where DuckDB gives NULL, and NaN
    # sorts above every double. Zero variability -> zero anomaly score,
    # stated identically on both engines (code-review finding #2).
    scored = dev.join(F.broadcast(sig), "event_type").select(  # bcast: fixed (1 row per event type)
        "event_type",
        "day",
        F.when(F.col("sigma") == 0, F.lit(0.0))
        .otherwise(F.round(F.col("dev") / F.col("sigma") + 1e-9, 4) + 0.0)
        .alias("score_r"),
    )
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum((F.col("score_r") > 3.0).cast("int"))
        .cast("long")
        .alias("n_anomalies"),
        F.date_format(
            F.max(F.struct("score_r", "day"))["day"], "yyyy-MM-dd"
        ).alias("worst_day"),
        F.max("score_r").alias("worst_score_r"),
    )


@register(
    "t31_rolling_correlation",
    oracle="""
    WITH d AS (
        SELECT l_returnflag AS flag, l_shipdate AS day,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev,
               CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem GROUP BY 1, 2
    ),
    w AS (
        SELECT flag, day,
               corr(rev, qty) OVER pw AS c,
               COUNT(*) OVER pw AS n,
               stddev_samp(rev) OVER pw AS sx,
               stddev_samp(qty) OVER pw AS sy
        FROM d
        WINDOW pw AS (PARTITION BY flag ORDER BY day
                      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT flag, CAST(day AS VARCHAR) AS day,
           ROUND(c + 1e-9, 4) + 0.0 AS corr_7d
    FROM w
    WHERE n = 7 AND sx > 0 AND sy > 0 AND YEAR(day) = 1995
    """,
)
def t31_rolling_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T31: rolling 7-day Pearson correlation between two co-measured
    series (daily revenue vs daily quantity per return flag) — the
    pairs-trading / co-movement monitor g19's STATIC correlation
    matrix cannot express: the window shows WHEN the coupling breaks,
    not just whether it holds on average. Emits 1995 days with a full
    7-day trailing window and non-degenerate variance on both legs
    (zero-variance windows are excluded explicitly: DuckDB corr yields
    NULL there while Spark yields NaN — the 0/0 cross-engine trap, cut
    rather than papered over).

    Scale shape: the fact collapses to the (flag, day) grain FIRST
    (one partial-aggregated shuffle; the window then slides over a
    calendar-bounded frame of ~2.5k rows per flag — bounded by DAYS,
    never fact rows, the t10/t12 discipline). Day sums are exact
    integer cents/centiunits on both engines, so the only float work
    is the correlation itself, computed by each engine's stable
    co-moment aggregate and compared at 4dp."""
    li = table(spark, sf_dir, "lineitem")
    d = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_shipdate").alias("day"),
    ).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("rev"),
        F.sum(F.round(F.col("l_quantity") * 100).cast("long"))
        .cast("long")
        .alias("qty"),
    )
    pw = W.partitionBy("flag").orderBy("day").rowsBetween(-6, 0)
    w = d.select(
        "flag",
        "day",
        F.corr("rev", "qty").over(pw).alias("c"),
        F.count(F.lit(1)).over(pw).alias("n"),
        F.stddev_samp("rev").over(pw).alias("sx"),
        F.stddev_samp("qty").over(pw).alias("sy"),
    )
    return (
        w.filter(
            (F.col("n") == 7)
            & (F.col("sx") > 0)
            & (F.col("sy") > 0)
            & (F.year("day") == 1995)
        )
        .select(
            "flag",
            F.col("day").cast("string").alias("day"),
            (F.round(F.col("c") + 1e-9, 4) + 0.0).alias("corr_7d"),
        )
    )


# --- t32: sequential-fold EWMA (round 9) --------------------------------

_EWMA_SQL = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    arrs AS (
        SELECT event_type,
               list(CAST(c AS DOUBLE) ORDER BY day) AS xs,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               MAX(day) AS last_day,
               CAST(SUM(c) AS BIGINT) AS total_cents
        FROM daily GROUP BY 1
    )
    SELECT event_type, n_days, last_day::VARCHAR AS last_day,
           ROUND(list_reduce(xs, (acc, x) ->
                     acc * CAST(0.7 AS DOUBLE) + x * CAST(0.3 AS DOUBLE))
                 + 1e-9, 4) + 0.0 AS ewma_cents,
           ROUND(CAST(total_cents AS DOUBLE) / n_days + 1e-9, 4) + 0.0
               AS mean_cents
    FROM arrs
"""


@register("t32_ewma_daily", oracle=_EWMA_SQL)
def t32_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T32: exponentially-weighted moving average of daily revenue per
    event type (α = 0.3, seeded with the first day) — the smoothing
    primitive behind every ops dashboard's trend line and the
    forecasting baseline Holt-Winters extends. The recursion
    ewma_t = α·x_t + (1−α)·ewma_{t−1} is ORDER-SENSITIVE, so it runs
    as a SEQUENTIAL FOLD over the per-type sorted daily array
    (F.aggregate / DuckDB list_reduce — the t20/l46 fold discipline):
    bit-identical across engines where a parallel float SUM would
    drift with shuffle order. Days with no events are skipped, not
    zero-filled (t8 grades the gap-fill variant of the spine).

    Scale shape: the fact collapses to |types| x |days| daily cents
    (map-side combined, exact integers); the fold runs per type over
    that bounded array — at 100 TB the array is still |days| long.
    The seed is the first element itself (list_reduce semantics =
    slice-fold from element 2), so a single-day type returns its own
    value."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("c"))
    arrs = daily.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "c"))),
            lambda x: x["c"].cast("double"),
        ).alias("xs"),
        F.count(F.lit(1)).alias("n_days"),
        F.max("day").alias("last_day"),
        F.sum("c").cast("long").alias("total_cents"),
    )
    ewma = F.aggregate(
        F.slice(F.col("xs"), 2, F.greatest(F.size("xs") - 1, F.lit(0))),
        F.element_at(F.col("xs"), 1),
        lambda acc, x: acc * F.lit(0.7) + x * F.lit(0.3),
    )
    return arrs.select(
        "event_type",
        "n_days",
        F.col("last_day").cast("string").alias("last_day"),
        (F.round(ewma + 1e-9, 4) + 0.0).alias("ewma_cents"),
        (
            F.round(F.col("total_cents").cast("double") / F.col("n_days") + 1e-9, 4)
            + 0.0
        ).alias("mean_cents"),
    )


# --- t33: rolling 7-day distinct actives (round 9) ----------------------

_ROLLING_DISTINCT_SQL = """
    WITH pairs AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    days AS (SELECT DISTINCT day FROM pairs),
    contrib AS (
        SELECT user_id,
               unnest(list_transform(range(0, 7),
                                     i -> day + CAST(i AS INTEGER))) AS wday
        FROM pairs
    ),
    roll AS (
        SELECT wday, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active_7d
        FROM contrib GROUP BY wday
    ),
    sameday AS (
        SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
        FROM pairs GROUP BY day
    )
    SELECT d.day::VARCHAR AS day, s.n_active, r.n_active_7d
    FROM days d
    JOIN roll r ON r.wday = d.day
    JOIN sameday s ON s.day = d.day
"""


@register("t33_rolling_distinct_users", oracle=_ROLLING_DISTINCT_SQL)
def t33_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T33: trailing-7-day distinct active users per observed day —
    the DAU/WAU engagement metric every product dashboard carries.
    Distinct-over-sliding-window does NOT decompose (a user active
    twice in the window counts once), so the exact formulation is
    contribute-and-count: each (user, day) first collapses to one row
    (map-side-combined distinct), then fans out to the <= 7 window
    days it contributes to, and one count-distinct per window day
    finishes it — the standard exact rolling-distinct shape (the
    approximate path at extreme scale swaps the final stage for HLL
    sketch merges, graded as g3).

    Scale shape: the fact collapses to |users| x |days| pairs before
    the 7x fan-out, so the shuffle is bounded by active-user-days,
    not events; no window function anywhere — the 'window' is an
    integer fan-out plus a hash aggregate, both parallel across
    days."""
    e = table(spark, sf_dir, "events")
    pairs = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    days = pairs.select("day").distinct()
    contrib = pairs.select(
        "user_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(6)),
                lambda i: F.date_add(F.col("day"), i),
            )
        ).alias("wday"),
    )
    roll = contrib.groupBy("wday").agg(
        F.count_distinct("user_id").alias("n_active_7d")
    )
    sameday = pairs.groupBy("day").agg(
        F.count_distinct("user_id").alias("n_active")
    )
    return (
        days.join(roll, days["day"] == roll["wday"])
        .join(sameday, "day")
        .select(
            F.col("day").cast("string").alias("day"),
            "n_active",
            "n_active_7d",
        )
    )


# --- t34: Holt linear-trend smoothing (round 9) --------------------------

_HOLT_SQL = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    arrs AS (
        SELECT event_type,
               list(CAST(c AS DOUBLE) ORDER BY day) AS xs,
               CAST(COUNT(*) AS BIGINT) AS n_days
        FROM daily GROUP BY 1
    ),
    folded AS (
        SELECT event_type, n_days,
               CASE WHEN n_days > 2 THEN
                   list_reduce(
                       list_concat([[xs[1], xs[2] - xs[1]]],
                                   list_transform(xs[3:], x -> [x])),
                       (acc, e) -> [
                           CAST(0.5 AS DOUBLE) * e[1]
                               + CAST(0.5 AS DOUBLE) * (acc[1] + acc[2]),
                           CAST(0.3 AS DOUBLE)
                               * ((CAST(0.5 AS DOUBLE) * e[1]
                                   + CAST(0.5 AS DOUBLE) * (acc[1] + acc[2]))
                                  - acc[1])
                               + CAST(0.7 AS DOUBLE) * acc[2]
                       ])
               ELSE [xs[1], xs[2] - xs[1]] END AS lt
        FROM arrs WHERE n_days >= 2
    )
    SELECT event_type, n_days,
           ROUND(lt[1] + 1e-9, 4) + 0.0 AS level_cents,
           ROUND(lt[2] + 1e-9, 4) + 0.0 AS trend_cents,
           ROUND(lt[1] + lt[2] + 1e-9, 4) + 0.0 AS forecast_next_cents
    FROM folded
"""


@register("t34_holt_linear_trend", oracle=_HOLT_SQL)
def t34_holt_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T34: Holt's linear-trend double exponential smoothing over
    daily revenue per event type (α=0.5, β=0.3; seeded l=x1,
    t=x2−x1) — the one-step forecaster EWMA (t32) can't be when the
    series trends. The recursion carries TWO coupled state
    components, so the fold accumulator is a [level, trend] array:
    elements are wrapped as single-element arrays so DuckDB's
    list_reduce (whose accumulator must share the element type) and
    Spark's F.aggregate run the IDENTICAL double chain — including
    recomputing level' inside the trend update, since SQL lambdas
    have no let-binding; same expression, same double. Types with
    fewer than 2 days are excluded on both engines.

    Scale shape: same as t32 — the fact collapses to exact daily
    integer cents, the fold runs per type over the bounded day
    array."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("c"))
    arrs = daily.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "c"))),
            lambda x: x["c"].cast("double"),
        ).alias("xs"),
        F.count(F.lit(1)).alias("n_days"),
    ).filter(F.col("n_days") >= 2)
    x1 = F.element_at("xs", 1)
    x2 = F.element_at("xs", 2)
    init = F.array(x1, x2 - x1)
    half, a_c, b_c, bc_c = F.lit(0.5), F.lit(0.3), F.lit(0.7), F.lit(0.5)

    def step(acc, e_):
        new_l = half * F.element_at(e_, 1) + bc_c * (
            F.element_at(acc, 1) + F.element_at(acc, 2)
        )
        new_t = a_c * (new_l - F.element_at(acc, 1)) + b_c * F.element_at(acc, 2)
        return F.array(new_l, new_t)

    lt = F.when(
        F.col("n_days") > 2,
        F.aggregate(
            F.transform(
                F.slice(F.col("xs"), 3, F.greatest(F.size("xs") - 2, F.lit(0))),
                lambda x: F.array(x),
            ),
            init,
            step,
        ),
    ).otherwise(init)
    folded = arrs.select("event_type", "n_days", lt.alias("lt"))
    return folded.select(
        "event_type",
        "n_days",
        (F.round(F.element_at("lt", 1) + 1e-9, 4) + 0.0).alias("level_cents"),
        (F.round(F.element_at("lt", 2) + 1e-9, 4) + 0.0).alias("trend_cents"),
        (
            F.round(F.element_at("lt", 1) + F.element_at("lt", 2) + 1e-9, 4) + 0.0
        ).alias("forecast_next_cents"),
    )
