"""Join operator queries J1-J7 (SURVEY.md §2.B).

Scale notes inline: dims broadcast explicitly, the fact side stays
shuffle-partitioned on the join key, and the as-of join uses the
union+window rewrite from operators/joins.py (one shuffle, no pair
blow-up).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from meepo_spark.catalog import table
from meepo_spark.operators.joins import asof_join
from meepo_spark.registry import register
from meepo_spark.operators.broadcast_gate import maybe_broadcast


@register(
    "j1_inner_broadcast",
    oracle="""
    SELECT n.n_name                                   AS nation,
           COUNT(*)                                   AS n_orders,
           ROUND(SUM(o.o_totalprice), 2)              AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def j1_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: fact ⋈ dim ⋈ dim. customer and nation broadcast — the only
    shuffle left at scale is the final 25-group aggregate."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        o.join(maybe_broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)  # bcast: fixed (nation)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@register(
    "j2_left_outer",
    oracle="""
    SELECT c.c_custkey,
           COUNT(o.o_orderkey)                         AS n_orders,
           ROUND(COALESCE(SUM(o.o_totalprice), 0), 2)  AS spend
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def j2_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: left outer — customers with zero orders survive with
    n_orders=0 (COUNT of the null-extended column)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("spend"),
        )
    )


@register(
    "j2b_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1),
         sn AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT COALESCE(cn.nk, sn.nk)        AS nationkey,
           COALESCE(cn.n_cust, 0)        AS n_cust,
           COALESCE(sn.n_supp, 0)        AS n_supp
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
)
def j2b_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: full outer over pre-aggregated sides (aggregate-then-join —
    the shuffle carries |nations| rows, not |customers|)."""
    cn = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sn = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cn.join(sn, "nk", "full").select(
        F.coalesce(cn.nk, sn.nk).alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@register(
    "j3_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 50000)
    """,
)
def j3_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: left-semi = EXISTS. The semi join short-circuits per key —
    no fan-out however many qualifying orders a customer has."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 50000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "j4_anti",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def j4_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: left-anti = NOT EXISTS — the same plan shape that powers
    in-doubt transaction detection in the parity layer (A10:
    prepared ⟕̸ committed)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "j5_theta_pairs",
    oracle="""
    SELECT n1.n_name AS nation_a, n2.n_name AS nation_b
    FROM nation n1 JOIN nation n2
      ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
    """,
)
def j5_theta_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: theta join — equi part (regionkey) hash-partitions, the
    strict inequality dedupes unordered pairs. Pure cross joins are
    reserved for broadcast-small sides only."""
    n1 = table(spark, sf_dir, "nation").alias("n1")
    n2 = table(spark, sf_dir, "nation").alias("n2")
    return n1.join(
        n2,
        (F.col("n1.n_regionkey") == F.col("n2.n_regionkey"))
        & (F.col("n1.n_nationkey") < F.col("n2.n_nationkey")),
    ).select(F.col("n1.n_name").alias("nation_a"), F.col("n2.n_name").alias("nation_b"))


@register(
    "j6_range_join",
    oracle="""
    SELECT o.o_orderkey,
           COUNT(*)                       AS n_shipped_60d,
           ROUND(SUM(l.l_quantity), 2)    AS qty_60d
    FROM orders o
    JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <  o.o_orderdate + INTERVAL 60 DAY
    GROUP BY o.o_orderkey
    """,
)
def j6_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: interval join. The equi key (orderkey) carries the hash
    join; the range predicate evaluates post-probe, so no nested-loop
    pair blow-up at scale."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate >= o.o_orderdate)
            & (li.l_shipdate < o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        )
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_shipped_60d"),
            F.round(F.sum("l_quantity"), 2).alias("qty_60d"),
        )
    )


@register(
    "j7_asof_join",
    oracle="""
    WITH purchases AS (
        SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
    ),
    views AS (  -- dedupe equal-ts views per user so ties are deterministic
        SELECT user_id, ts AS view_ts, MAX(value) AS view_value
        FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    )
    SELECT p.user_id, p.event_id,
           STRFTIME(v.view_ts, '%Y-%m-%d %H:%M:%S')   AS matched_view_ts,
           ROUND(v.view_value, 2)                      AS view_value
    FROM purchases p
    ASOF LEFT JOIN views v ON p.user_id = v.user_id AND p.ts >= v.view_ts
    """,
)
def j7_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: as-of join — each purchase matched to the user's latest
    view at-or-before it. Uses the join-free union+window rewrite
    (operators/joins.py); DuckDB's native ASOF JOIN is the oracle.
    This is the event-store 'state as of t' primitive (A8/A9)."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
        .select("user_id", F.col("ts").alias("view_ts"), "view_value")
    )
    views2 = views.select(
        "user_id",
        F.col("view_ts").alias("vts"),
        "view_value",
        F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss").alias("matched_view_ts"),
    )
    joined = asof_join(
        purchases,
        views2,
        on="user_id",
        left_ts="ts",
        right_ts="vts",
        right_values=["view_value", "matched_view_ts"],
    )
    return joined.select(
        "user_id",
        "event_id",
        "matched_view_ts",
        F.round("view_value", 2).alias("view_value"),
    )


@register(
    "j10_band_join",
    oracle="""
    SELECT e.event_id                     AS error_id,
           COUNT(*)                       AS n_purchases_30m,
           ROUND(SUM(p.value) + 1e-9, 2)  AS purchased_value
    FROM events e
    JOIN events p
      ON p.event_type = 'purchase'
     AND p.ts >= e.ts
     AND p.ts <  e.ts + INTERVAL 30 MINUTE
    WHERE e.event_type = 'error'
    GROUP BY e.event_id
    """,
)
def j10_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10: band join with NO equi key — "purchases (any user) within
    30 minutes after each error" — through the bucketed-range rewrite
    (operators/joins.py range_join): both sides gain an equi bucket
    key floor(unix_ts / width) (the interval side exploded to its two
    straddled buckets), so Catalyst plans a HASH join on the bucket
    instead of the nested-loop product a bare theta condition forces.
    Pairs examined shrink from |errors|×|purchases| to pairs sharing
    a 30-minute bucket — the SURVEY §4.3#4 rewrite, plan-asserted in
    tests/test_plans.py.

    The oracle runs the same join as a plain theta join — DuckDB's
    IEJoin handles it natively, which is exactly the point: Spark
    needs the rewrite, and gets the same answer with it."""
    from meepo_spark.operators.joins import range_join

    e = table(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), F.col("ts").alias("e_ts")
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        F.col("ts").alias("p_ts"), F.col("value").alias("p_value")
    )
    cond = (F.col("p_ts") >= F.col("e_ts")) & (
        F.col("p_ts") < F.col("e_ts") + F.expr("INTERVAL 30 MINUTES")
    )
    joined = range_join(
        purch,
        errors,
        cond,
        bucket=(
            F.unix_timestamp(F.col("p_ts")),
            F.unix_timestamp(F.col("e_ts")),
            "1800",
        ),
    )
    return joined.groupBy("error_id").agg(
        F.count(F.lit(1)).alias("n_purchases_30m"),
        F.round(F.sum("p_value") + F.lit(1e-9), 2).alias("purchased_value"),
    )


@register(
    "j11_salted_skew_join",
    oracle="""
    SELECT s.s_nationkey                              AS nationkey,
           COUNT(*)                                   AS n_items,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_nationkey
    """,
)
def j11_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11: skew-resistant salted equi-join, graded. The fact side's
    join key is split across 8 random salt sub-keys and the dimension
    side is replicated once per salt value, so a pathologically hot
    supplier key spreads over 8 tasks instead of stalling one
    straggler (operators/joins.py:salted_join; equality with the
    plain join is also Hypothesis property-tested).

    The oracle is the UNsalted join — the whole point of salting is
    that the result set is identical, and the hash match proves it.
    Salt never escapes: it is projected away before the aggregate,
    and the aggregate itself re-shuffles on s_nationkey only. Use
    this shape when the skew is known ahead of time or sits on the
    build side where AQE's runtime skew split cannot help."""
    from meepo_spark.operators.joins import salted_join

    li = table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    sup = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    joined = salted_join(li, sup, on="l_suppkey", salt=8)
    return joined.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.count("*").alias("n_items"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
    )

@register(
    "j12_bloom_prune_join",
    # The oracle is the PLAIN semi join: the bloom is a transparent
    # prefilter (no false negatives by construction; false positives
    # removed by the exact join), so the result must be exactly the
    # un-pruned answer — which is precisely what makes a runtime
    # filter safe to inject. A build/probe hash mismatch would drop
    # rows and fail this oracle.
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))), 2)
                AS DOUBLE) AS revenue
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey
                    AND c.c_mktsegment = 'AUTOMOBILE')
    GROUP BY 1
    """,
)
def j12_bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12: bloom-filter-pruned semi join — the RUNTIME FILTER pattern
    built from first principles (Spark's own
    spark.sql.optimizer.runtime.bloomFilter injects the same shape for
    shuffle joins; its bloom_filter_agg/might_contain expressions are
    not exposed to SQL, so this builds the filter openly). The hot-key
    side (AUTOMOBILE customers) hashes each key to 3 positions in a
    65536-bit bloom (md5 4-hex-digit slices), OR-folded into a dense
    1024-word bitmap; the fact side tests all 3 bits per row via O(1)
    element_at word lookups BEFORE the exact semi join removes the
    ~(fill_ratio)^3 false positives.

    Scale shape: the bitmap is ONE 8 KB row broadcast to every task —
    at 100 TB the fact scan drops non-matching rows map-side without
    shuffling them toward the join, which is the entire value of a
    semi-join runtime filter when the fact >> dim selectivity. The
    bit math is pure codegen; the exact semi join stays broadcast
    (dim-bounded build side)."""
    from meepo_spark.operators.bloom import bloom_build, bloom_prune

    o = table(spark, sf_dir, "orders")
    hot = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "AUTOMOBILE")
        .select("c_custkey")
    )
    bloom = bloom_build(hot, "c_custkey")
    pruned = bloom_prune(
        o.select("o_custkey", "o_orderpriority", "o_totalprice"),
        "o_custkey", bloom,
    )
    return (
        pruned.join(
            maybe_broadcast(hot), pruned["o_custkey"] == hot["c_custkey"], "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("revenue"),
        )
    )

@register(
    "j13_asof_nearest",
    # The oracle is the direct band-join formulation (candidates within
    # the tolerance, ranked by gap) — deliberately a DIFFERENT
    # algorithm from the engine's union+window plan, so the hash match
    # cross-checks the trick, not just reproduces it. Tie rules mirror
    # last_value/first_value exactly: equal gaps prefer the backward
    # (earlier) match; equal-ts backward candidates take the highest
    # event_id, forward the lowest.
    oracle="""
    WITH e AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'error'),
         p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
         cand AS (
           SELECT e.event_id AS error_id, e.user_id,
                  p.event_id AS purchase_id,
                  CAST(date_diff('second', e.ts, p.ts) AS BIGINT) AS gap_s,
                  ROW_NUMBER() OVER (
                    PARTITION BY e.event_id
                    -- full-microsecond gap: ranking on truncated
                    -- seconds ties purchases the engine's
                    -- full-precision window order distinguishes
                    -- (code-review r3b finding #2)
                    ORDER BY ABS(date_diff('microsecond', e.ts, p.ts)) ASC,
                             (p.ts > e.ts) ASC,
                             CASE WHEN p.ts <= e.ts THEN -p.event_id
                                  ELSE p.event_id END ASC) AS rn
           FROM e JOIN p
             ON p.user_id = e.user_id
            AND p.ts >= e.ts - INTERVAL 30 MINUTE
            AND p.ts <= e.ts + INTERVAL 30 MINUTE)
    SELECT error_id, user_id, purchase_id, gap_s
    FROM cand WHERE rn = 1
    """,
)
def j13_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J13: NEAREST-direction as-of join with tolerance — for every
    error event, the closest purchase by the same user within ±30
    minutes, ties to the earlier (backward) side: pandas
    merge_asof(direction='nearest') semantics, which Spark has no
    native operator for and j7 (backward-only) cannot express.

    Scale shape: the union+dual-window plan — one shuffle keyed by
    user_id carries BOTH event sets; the backward candidate is a
    conditional last_value over the preceding frame, the forward a
    conditional first_value over the following frame, and the winner
    is a per-row arithmetic choice. Never the oracle's band join
    (whose candidate set is |errors| x |purchases-in-window| — fine
    for DuckDB at sf0.01, quadratic in burst density at 100 TB)."""
    e = table(spark, sf_dir, "events")
    side = F.when(F.col("event_type") == "purchase", 0).otherwise(1)
    both = e.filter(F.col("event_type").isin("error", "purchase")).select(
        "event_id", "user_id", "ts", side.alias("__side")
    )
    w = W.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("__side").asc(), F.col("event_id").asc()
    )
    is_p = F.col("__side") == 0
    pstruct = F.when(is_p, F.struct("ts", "event_id"))
    marked = both.select(
        "event_id", "user_id", "ts", "__side",
        F.last(pstruct, ignorenulls=True)
        .over(w.rowsBetween(W.unboundedPreceding, -1))
        .alias("__back"),
        F.first(pstruct, ignorenulls=True)
        .over(w.rowsBetween(1, W.unboundedFollowing))
        .alias("__fwd"),
    )
    err = marked.filter(F.col("__side") == 1)
    # band + nearest comparisons in FULL microseconds — truncated
    # seconds admitted edge purchases the oracle's INTERVAL band
    # excludes and tied sub-second-distinct candidates (code-review
    # r3b findings #1/#2); the REPORTED gap stays whole seconds
    # (difference of epoch floors == DuckDB date_diff('second')).
    gb_us = F.unix_micros("ts") - F.unix_micros("__back.ts")  # >= 0
    gf_us = F.unix_micros("__fwd.ts") - F.unix_micros("ts")  # > 0
    tol = 1800 * 1_000_000
    back_ok = F.col("__back").isNotNull() & (gb_us <= tol)
    fwd_ok = F.col("__fwd").isNotNull() & (gf_us <= tol)
    pick_back = back_ok & (~fwd_ok | (gb_us <= gf_us))  # tie -> backward
    gb_s = F.unix_timestamp("ts") - F.unix_timestamp("__back.ts")
    gf_s = F.unix_timestamp("__fwd.ts") - F.unix_timestamp("ts")
    return err.select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.when(pick_back, F.col("__back.event_id"))
        .when(fwd_ok, F.col("__fwd.event_id"))
        .alias("purchase_id"),
        F.when(pick_back, -gb_s).when(fwd_ok, gf_s).alias("gap_s"),
    ).filter(F.col("purchase_id").isNotNull())
