"""Composite analytics, wave 3 — the last classic TPC-H shapes
(Q2/Q11/Q13/Q15/Q17/Q20/Q21) adapted to the fixture schema
(FIXTURES.md: no partsupp → lineitem is the part↔supplier link; no
commit/receipt dates → lateness = shipped >60 days after order).

Drift-safe conventions (see tools/selfcheck.py): money sums in
DECIMAL (order-independent), correlated thresholds built only from
exact IEEE ops (min/max/+/÷2 — never a parallel double SUM/AVG on a
comparison boundary), dates rendered as strings, COUNT cast BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from meepo_spark.catalog import table
from meepo_spark.registry import register
from meepo_spark.queries.exp_frames import REV_ARMS_SQL, user_revenue_arms
from meepo_spark.operators.broadcast_gate import maybe_broadcast


def _dec(col: str = "l_extendedprice") -> F.Column:
    return F.col(col).cast("decimal(18,6)")


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    )
    SELECT s.s_name, n.n_name, p.p_partkey, p.p_name,
           ROUND(s.s_acctbal, 2) AS acctbal,
           ROUND(c.unit_cost, 4) AS unit_cost
    FROM part p
    JOIN cost c ON c.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size IN (5, 10, 15) AND p.p_type = 'SMALL'
      AND r.r_name = 'ASIA'
      AND c.unit_cost = (
          SELECT MIN(c2.unit_cost)
          FROM cost c2
          JOIN supplier s2 ON s2.s_suppkey = c2.l_suppkey
          JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
          JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
          WHERE c2.l_partkey = p.p_partkey AND r2.r_name = 'ASIA')
    ORDER BY acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: cheapest supplier per part within a region — the
    correlated-MIN subquery decorrelated into a window min over the
    region-filtered cost table (one pass instead of a rejoin; unit
    cost per (part, supplier) is an exact-IEEE division so the
    equality compare is engine-stable). The fact table aggregates to
    (part, supplier) granularity before any dim join; every dim
    broadcasts."""
    from pyspark.sql import Window as W

    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        F.col("p_size").isin(5, 10, 15) & (F.col("p_type") == "SMALL")
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    cost = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    regional = (
        cost.join(maybe_broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))  # bcast: fixed (nation)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))  # bcast: fixed (region)
    )
    best = regional.withColumn(
        "min_cost", F.min("unit_cost").over(W.partitionBy("l_partkey"))
    ).filter(F.col("unit_cost") == F.col("min_cost"))
    return (
        best.join(maybe_broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round("s_acctbal", 2).alias("acctbal"),
            F.round("unit_cost", 4).alias("unit_cost"),
        )
        .orderBy(F.col("acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH v AS (
        SELECT l.l_partkey,
               SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS value
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name = 'NATION_9'
        GROUP BY l.l_partkey
    )
    SELECT l_partkey, CAST(ROUND(value, 2) AS DOUBLE) AS value
    FROM v
    WHERE value > (SELECT SUM(value) * CAST(0.001 AS DECIMAL(7,6)) FROM v)
    ORDER BY value DESC, l_partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts whose one-nation inventory value exceeds a
    fraction of the total — a global-scalar-subquery HAVING. Both the
    per-part sums and the grand total are DECIMAL (exact, so the
    threshold comparison cannot drift between engines). The scalar is
    a broadcast one-row crossJoin, not a driver round-trip: both
    branches share the identical per-part aggregate subplan, so
    Spark's ReuseExchange runs the fact scan + shuffle once and the
    plan stays a single uninterrupted DAG (no driver sync barrier)."""
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_9")
    v = (
        l.join(maybe_broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))  # bcast: fixed (nation)
        .groupBy("l_partkey")
        .agg(F.sum(_dec()).alias("value"))
    )
    threshold = v.agg(
        (F.sum("value") * F.lit("0.001").cast("decimal(7,6)")).alias("t")
    )
    return (
        v.crossJoin(F.broadcast(threshold))  # bcast: fixed (1-row threshold)
        .filter(F.col("value") > F.col("t"))
        .select(
            "l_partkey", F.round("value", 2).cast("double").alias("value")
        )
        .orderBy(F.col("value").desc(), "l_partkey")
    )


@register(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '4-NOT SPECIFIED'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: customer order-count histogram with the filter in
    the OUTER JOIN's ON clause (priority stands in for the comment
    NOT-LIKE) — zero-order customers must survive with count 0, which
    a WHERE would destroy. Two aggs: per-customer, then histogram."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                   AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(ROUND(r.total_revenue, 2) AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: the revenue 'view' built once, its MAX folded to a
    1-row aggregate and broadcast back (the q11/q22 discipline) —
    DECIMAL revenue makes the equality exact on both engines. The
    identical revenue subplan feeds both branches, so ReuseExchange
    keeps it ONE fact pass; no window ever holds the |suppliers|-row
    view in a single task (r3 fix: the old empty-frame window max put
    the whole view through one WindowExec partition)."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1997-04-01")
        # explicit, so BOTH revenue consumers (join branch, max branch)
        # canonicalize to the same subplan and AQE reuses one exchange —
        # the supplier join would inject isnotnull on its branch only,
        # forcing a second fact scan
        & F.col("l_suppkey").isNotNull()
    )
    s = table(spark, sf_dir, "supplier")
    revenue = l.groupBy("l_suppkey").agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)"))
        .alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        revenue.crossJoin(F.broadcast(mx))  # bcast: fixed (1-row max)
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(maybe_broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_revenue", 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) / 7.0, 2)
                AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#2'
      AND l.l_quantity < (
          SELECT (MIN(l2.l_quantity) + MAX(l2.l_quantity)) / 2
          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: revenue lost to small-quantity orders — a correlated
    per-part aggregate threshold. The canonical AVG is a parallel
    double sum whose last bit depends on add order, and rows sitting
    ON the threshold would flip between engines; (min+max)/2 keeps the
    correlated-aggregate plan shape with bit-exact IEEE semantics.
    Decorrelated: per-part thresholds aggregate the fact once, then a
    broadcast-joined filter — no per-row subquery execution."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2")
    thresholds = l.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        ((F.min("l_quantity") + F.max("l_quantity")) / 2).alias("qty_threshold")
    )
    return (
        l.join(maybe_broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(maybe_broadcast(thresholds), F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.round(F.sum(_dec()) / 7.0, 2)).cast("double").alias("avg_yearly")
        )
    )


@register(
    "q20_excess_shippers",
    oracle="""
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        WHERE l.l_partkey IN
              (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
          AND l.l_shipdate >= TIMESTAMP '1998-01-01'
          AND l.l_shipdate <  TIMESTAMP '1999-01-01'
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING SUM(l.l_quantity) > 40)
    ORDER BY s.s_name
    """,
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers who moved excess volume of a part family
    in a year — nested IN-subqueries become a semi-join chain: part
    filter semi-joins the fact, the HAVING aggregate gates, and the
    survivor keys semi-join supplier. Quantity sums are small-int
    doubles (exact), so the HAVING threshold is engine-stable."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1999-01-01")
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    heavy = (
        l.join(maybe_broadcast(p), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 40)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))  # bcast: fixed (nation)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH late AS (
        SELECT DISTINCT l.l_suppkey, l.l_orderkey
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    ),
    lines AS (SELECT DISTINCT l_suppkey, l_orderkey FROM lineitem)
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late t
    JOIN supplier s ON s.s_suppkey = t.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lines l2
                  WHERE l2.l_orderkey = t.l_orderkey
                    AND l2.l_suppkey <> t.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = t.l_orderkey
                        AND l3.l_suppkey <> t.l_suppkey)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers solely responsible for late multi-supplier
    orders (late = shipped >60 days after order date, standing in for
    the missing receipt/commit dates). The EXISTS / NOT-EXISTS pair
    decorrelates into one per-order aggregate over the
    (order, supplier) pair grain.

    Optimization r10 reduced the fact ONCE to pair grain —
    groupBy(l_orderkey, l_suppkey) with max(is_late) — with the
    per-order census and the late-pair set both derived from it.
    Optimization r11: the intended AQE exchange reuse between those
    two consumers never fired (column pruning diverges the subtrees:
    the census side drops l_suppkey, the candidate side keeps it —
    the before-plan ran the fact⋈orders chain twice, 10 parquet
    scans). The census is now a WINDOW aggregate over l_orderkey on
    the pair frame itself — n_supp = COUNT(*) OVER (PARTITION BY
    l_orderkey) and n_late_supp = SUM(is_late) OVER (...) at pair
    grain ARE the distinct counts — so ONE fact pass feeds one pair
    aggregate feeds one bounded window (partitions = suppliers per
    order, ~4), no self-join, no semi-join, no duplicate subtree."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    s = table(spark, sf_dir, "supplier")
    pairs = (
        l.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(
            maybe_broadcast(o.select("o_orderkey", "o_orderdate")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).alias("is_late")
        )
    )
    ow = W.partitionBy("l_orderkey")
    sole_late = (
        pairs.select(
            "l_suppkey",
            "is_late",
            F.count(F.lit(1)).over(ow).alias("n_supp"),
            F.sum(F.col("is_late").cast("int")).over(ow).alias("n_late_supp"),
        )
        .filter(
            F.col("is_late")
            & (F.col("n_supp") > 1)
            & (F.col("n_late_supp") == 1)
        )
        .select("l_suppkey")
    )
    return (
        sole_late.join(maybe_broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


@register(
    "q23_revenue_growth",
    oracle="""
    WITH monthly AS (
        SELECT n.n_name,
               CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
               SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                        AS DECIMAL(18,6))) AS rev
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n   ON n.n_nationkey = c.c_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY 1, 2
    )
    SELECT n_name, month::VARCHAR AS month,
           CAST(ROUND(rev, 2) AS DOUBLE) AS revenue,
           ROUND(CAST(rev - LAG(rev) OVER w AS DOUBLE)
                 / CAST(LAG(rev) OVER w AS DOUBLE) + 1e-9, 4) + 0.0
             AS mom_growth
    FROM monthly
    WINDOW w AS (PARTITION BY n_name ORDER BY month)
    """,
)
def q23_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite: month-over-month revenue growth per nation — the
    window-over-join report every finance dashboard runs (joined
    fact → time-grain aggregate → LAG ratio). Covers the shape TPC-H
    misses: analytic functions consuming a multi-join aggregate.

    Scale: nation broadcasts; orders/customer join by shuffle (both
    grow with the data — forcing them broadcast would be the classic
    fixture-scale mistake, so the hint is left to AQE); the fact then
    collapses in the monthly GROUP BY, and LAG runs per-nation over
    ~|months| rows of aggregate. Revenue stays DECIMAL into the window so the
    growth-ratio numerator is exact; only the reported ratio is
    floating (nudged + rounded)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    monthly = (
        li.join(o.select("o_orderkey", "o_custkey", "o_orderdate"),
                F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c.select("c_custkey", "c_nationkey"),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name")),  # bcast: fixed (nation)
              F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(
            "n_name",
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            ).alias("rev")
        )
    )
    w = W.partitionBy("n_name").orderBy("month")
    prev = F.lag("rev").over(w)
    return monthly.select(
        "n_name",
        F.col("month").cast("string").alias("month"),
        F.round("rev", 2).cast("double").alias("revenue"),
        (
            F.round(
                (F.col("rev") - prev).cast("double") / prev.cast("double")
                + 1e-9,
                4,
            )
            + 0.0  # normalize IEEE negative zero (growth == -epsilon)
        ).alias("mom_growth"),
    )


@register(
    "e20_quantile_treatment_effect",
    oracle=f"""
    WITH rev AS ({REV_ARMS_SQL}),
    q AS (
        SELECT arm,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               quantile_cont(cents, 0.25) AS q25,
               quantile_cont(cents, 0.50) AS q50,
               quantile_cont(cents, 0.75) AS q75
        FROM rev GROUP BY arm
    )
    SELECT a.n_users AS n_control, b.n_users AS n_treatment,
           ROUND(a.q25 / 100.0, 2) AS c_p25,
           ROUND(a.q50 / 100.0, 2) AS c_p50,
           ROUND(a.q75 / 100.0, 2) AS c_p75,
           ROUND((b.q25 - a.q25) / 100.0, 2) + 0.0 AS qte_p25,
           ROUND((b.q50 - a.q50) / 100.0, 2) + 0.0 AS qte_p50,
           ROUND((b.q75 - a.q75) / 100.0, 2) + 0.0 AS qte_p75
    FROM (SELECT * FROM q WHERE arm = 0) a
    CROSS JOIN (SELECT * FROM q WHERE arm = 1) b
    """,
)
def e20_quantile_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E20: quantile treatment effect — the distributional view of the
    v16/v23 experiment: per-user purchase revenue by arm, exact
    p25/p50/p75 per arm, and the per-quantile control→treatment
    difference. Mean lift (v16's world) hides where the effect lives;
    QTE shows whether the tail or the median moved — the standard
    heavy-tail readout for revenue metrics.

    Scale shape: one per-user aggregate (shuffle keyed on user), then
    exact per-arm quartiles via the census+refine operator
    (optimization r11, VERDICT r10 #3 — `F.percentile`'s per-arm
    value→count map over user-grain cents was the weakly-bounded
    value-map shape retired everywhere this round); the 2-row
    quantile frame self-joins arm 0 × arm 1 at driver-trivial size.
    QTE differences round AFTER subtraction with the -0.0
    normalization (a zero effect must not hash as '-0')."""
    from meepo_spark.operators.quantiles import exact_quantiles_cdf

    rev = user_revenue_arms(spark, sf_dir).localCheckpoint()
    q = exact_quantiles_cdf(
        rev, ["arm"], "cents", {"q25": 0.25, "q50": 0.50, "q75": 0.75}
    )
    a = q.filter(F.col("arm") == 0).select(
        F.col("n").alias("n_control"),
        F.col("q25").alias("a25"), F.col("q50").alias("a50"),
        F.col("q75").alias("a75"),
    )
    b = q.filter(F.col("arm") == 1).select(
        F.col("n").alias("n_treatment"),
        F.col("q25").alias("b25"), F.col("q50").alias("b50"),
        F.col("q75").alias("b75"),
    )
    return a.crossJoin(F.broadcast(b)).select(  # bcast: fixed (1-row arm frame)
        "n_control",
        "n_treatment",
        F.round(F.col("a25") / 100.0, 2).alias("c_p25"),
        F.round(F.col("a50") / 100.0, 2).alias("c_p50"),
        F.round(F.col("a75") / 100.0, 2).alias("c_p75"),
        (F.round((F.col("b25") - F.col("a25")) / 100.0, 2) + 0.0).alias("qte_p25"),
        (F.round((F.col("b50") - F.col("a50")) / 100.0, 2) + 0.0).alias("qte_p50"),
        (F.round((F.col("b75") - F.col("a75")) / 100.0, 2) + 0.0).alias("qte_p75"),
    )


# --- e21: sample-ratio-mismatch check (round 8) ------------------------

_SRM_SQL = """
    WITH arms AS (
        SELECT event_type,
               CAST(COUNT(DISTINCT CASE WHEN user_id % 2 = 0
                                        THEN user_id END) AS BIGINT) AS n0,
               CAST(COUNT(DISTINCT CASE WHEN user_id % 2 = 1
                                        THEN user_id END) AS BIGINT) AS n1
        FROM events GROUP BY event_type
    ),
    chi AS (
        SELECT event_type, n0, n1,
               CAST(n0 - n1 AS DOUBLE) * CAST(n0 - n1 AS DOUBLE)
                   / CAST(n0 + n1 AS DOUBLE) AS chi2
        FROM arms WHERE n0 + n1 > 0
    ),
    zs AS (SELECT event_type, n0, n1, chi2, sqrt(chi2) AS az FROM chi),
    ks AS (SELECT event_type, n0, n1, chi2, az,
                  CAST(1 AS DOUBLE)
                  / (CAST(1 AS DOUBLE) + CAST(0.2316419 AS DOUBLE) * az) AS k
           FROM zs),
    ps AS (
        SELECT event_type, n0, n1, chi2,
               CAST(2 AS DOUBLE)
                   * (exp(-(az * az) / CAST(2 AS DOUBLE))
                      / sqrt(CAST(2 AS DOUBLE) * pi()))
                   * (((((CAST(1.330274429 AS DOUBLE) * k
                          - CAST(1.821255978 AS DOUBLE)) * k
                         + CAST(1.781477937 AS DOUBLE)) * k
                        - CAST(0.356563782 AS DOUBLE)) * k
                       + CAST(0.319381530 AS DOUBLE)) * k) AS p
        FROM ks
    )
    SELECT event_type, n0, n1,
           ROUND(chi2 + 1e-9, 4) + 0.0 AS chi2,
           ROUND(p + 1e-9, 6) + 0.0 AS p_value,
           (p < CAST(0.001 AS DOUBLE)) AS srm_flag
    FROM ps
"""


@register("e21_srm_check", oracle=_SRM_SQL)
def e21_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E21: sample-ratio-mismatch detection — THE first gate every
    experiment readout runs before any metric is believed: per
    event_type, the distinct-user split across hash-parity arms is
    chi-square-tested against the designed 50/50; p < 0.001 flags a
    broken randomizer/logging path (the industry-standard SRM
    threshold). Complements v16 (the metric test) and v26 (the
    multiplicity correction): SRM invalidates both when it fires.

    Chi-square with 1 df: chi2 = (n0-n1)^2/(n0+n1) exactly (integer
    numerator), and the survival function is 2*(1-Phi(sqrt(chi2))) —
    the same shared-SQL-text A&S 26.2.17 polynomial v26 uses, so both
    engines run the identical double chain (decimal literals all
    explicitly CAST).

    Scale shape: one distinct-user aggregate per (event_type, arm) —
    map-side partial over the user domain — then all float work runs
    on the |event_type|-row census."""
    from meepo_spark.catalog import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(_SRM_SQL)


# --- round 9: TPC-DS-shaped composites (VERDICT r8 #5) -----------------

_ROLLUP_TOPK_SQL = """
    WITH agg AS (
        SELECT COALESCE(p_brand, 'ALL') AS brand,
               COALESCE(p_type, 'ALL') AS ptype,
               SUM(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(18,6))) AS rev
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY ROLLUP(p_brand, p_type)
    )
    SELECT brand, ptype,
           CAST(ROUND(rev, 2) AS DOUBLE) + 0.0 AS revenue,
           CAST(rk AS BIGINT) AS rk
    FROM (
        SELECT brand, ptype, rev,
               ROW_NUMBER() OVER (PARTITION BY brand
                                  ORDER BY rev DESC, ptype ASC) AS rk
        FROM agg
    ) WHERE rk <= 3
"""


@register("q24_windowed_rollup_topk", oracle=_ROLLUP_TOPK_SQL)
def q24_windowed_rollup_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q24 (TPC-DS q67 shape): hierarchical ROLLUP over the joined
    fact, then rank-within-group on the ROLLED-UP aggregate — top-3
    part types per brand, plus each brand's subtotal ranking inside
    its own group and the grand total. The DS shape TPC-H misses:
    a window consuming Expand output, so the rank sees subtotal rows
    as peers of detail rows.

    Cross-engine: revenue summed in DECIMAL(18,6) (order-immune),
    rounded once at the edge; rollup NULLs are labelled 'ALL' on both
    engines (fixture brands/types are never NULL, so the label is
    unambiguous); rank ties break on the type label.

    Scale shape: ONE fact scan — the rollup is a single Expand (x3
    grouping combos) into one partial+final aggregate, never a
    per-level re-scan (plan-asserted in tests/test_plans.py); the
    ranking window runs on the <= |brands|x|types| aggregate grid and
    is rank-limited (WindowGroupLimit pair)."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    agg = (
        li.join(maybe_broadcast(p), li["l_partkey"] == p["p_partkey"])
        .rollup("p_brand", "p_type")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            ).alias("rev")
        )
        .select(
            F.coalesce("p_brand", F.lit("ALL")).alias("brand"),
            F.coalesce("p_type", F.lit("ALL")).alias("ptype"),
            "rev",
        )
    )
    win = W.partitionBy("brand").orderBy(F.col("rev").desc(), F.col("ptype").asc())
    return (
        agg.select("brand", "ptype", "rev", F.row_number().over(win).alias("rk"))
        .filter(F.col("rk") <= 3)
        .select(
            "brand",
            "ptype",
            (F.round("rev", 2).cast("double") + 0.0).alias("revenue"),
            F.col("rk").cast("long").alias("rk"),
        )
    )


_CHANNEL_STAR_SQL = """
    WITH ch AS (
        SELECT 'lineitem' AS channel, n.n_name AS nation,
               CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(18,6)) AS amt
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        UNION ALL
        SELECT 'orders' AS channel, n.n_name AS nation,
               CAST(o.o_totalprice AS DECIMAL(18,6)) AS amt
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
    )
    SELECT COALESCE(channel, 'ALL') AS channel,
           COALESCE(nation, 'ALL') AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(ROUND(SUM(amt), 2) AS DOUBLE) + 0.0 AS amount
    FROM ch
    GROUP BY GROUPING SETS ((channel, nation), (channel), ())
"""


@register("q25_channel_union_star", oracle=_CHANNEL_STAR_SQL)
def q25_channel_union_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q25 (TPC-DS q5/q77 shape): multi-channel UNION star — two fact
    channels (lineitem revenue by SUPPLIER nation, order totals by
    CUSTOMER nation) unioned with a channel tag, then GROUPING SETS
    ((channel, nation), (channel), ()) for the per-cell / per-channel
    / grand-total report in one statement.

    Scale shape: each fact is scanned EXACTLY ONCE — the union feeds
    one Expand (x3 sets) into a single partial+final aggregate; a
    per-set re-aggregation would triple the fact traffic
    (plan-asserted: one Expand, one scan per fact). Dimension joins
    broadcast; amounts in DECIMAL so the union'd sum is
    shuffle-order-immune."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    ch1 = (
        li.join(maybe_broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(maybe_broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select(
            F.lit("lineitem").alias("channel"),
            F.col("n_name").alias("nation"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(18,6)")
            .alias("amt"),
        )
    )
    ch2 = (
        o.join(maybe_broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(maybe_broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select(
            F.lit("orders").alias("channel"),
            F.col("n_name").alias("nation"),
            F.col("o_totalprice").cast("decimal(18,6)").alias("amt"),
        )
    )
    return (
        ch1.unionAll(ch2)
        .groupingSets(
            [["channel", "nation"], ["channel"], []], "channel", "nation"
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("amt").alias("amt"),
        )
        .select(
            F.coalesce("channel", F.lit("ALL")).alias("channel"),
            F.coalesce("nation", F.lit("ALL")).alias("nation"),
            "n_rows",
            (F.round("amt", 2).cast("double") + 0.0).alias("amount"),
        )
    )


_EXISTS_MIX_SQL = """
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS acctbal_cents
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderpriority = '1-URGENT'
    )
    AND NOT EXISTS (
        SELECT 1
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_custkey = c.c_custkey
          AND l.l_returnflag = 'R'
          AND l.l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
    )
    GROUP BY c.c_mktsegment
"""


@register("q26_exists_antijoin_mix", oracle=_EXISTS_MIX_SQL)
def q26_exists_antijoin_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q26 (TPC-DS q16/q69 shape): correlated EXISTS and NOT EXISTS
    over TWO different fact paths in one predicate — customers who
    placed at least one URGENT order but no RECENTLY-returned line
    item (shipped 2000+; the anti side correlates through an
    orders-lineitem JOIN with its own pushed filter, not a single
    table — and without the recency cut the intersection is empty at
    every fixture SF, which would grade nothing). TPC-H's q4/q21/q22 each use one quantifier;
    the DS mix is both at once, which is where a planner must produce
    semi + anti joins off shared fact scans rather than re-evaluating
    subqueries per row.

    Scale shape: EXISTS -> left-semi on o_custkey over the filtered
    orders; NOT EXISTS -> left-anti against the (orders join
    returned-lineitem) custkey stream — both pushed filters; no
    per-row subquery anywhere. Account balances in exact cents."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    returned = (
        li.filter(
            (F.col("l_returnflag") == "R")
            & (F.col("l_shipdate") >= "2000-01-01")
        )
        .select("l_orderkey")
        .join(o.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_custkey")
    )
    kept = (
        c.join(urgent, c["c_custkey"] == urgent["o_custkey"], "left_semi")
        .join(returned, c["c_custkey"] == returned["o_custkey"], "left_anti")
    )
    return kept.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("long"))
        .cast("long")
        .alias("acctbal_cents"),
    )


_CROSS_CHANNEL_SQL = """
    WITH l_by AS (
        SELECT n.n_name AS nation,
               CAST(date_part('year', o2.o_orderdate) AS BIGINT) AS yr,
               SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                        AS DECIMAL(18,6))) AS rev_line
        FROM lineitem l
        JOIN orders o2  ON l.l_orderkey = o2.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        GROUP BY 1, 2
    ),
    o_by AS (
        SELECT n.n_name AS nation,
               CAST(date_part('year', o.o_orderdate) AS BIGINT) AS yr,
               SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS rev_orders
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2
    ),
    joined AS (
        SELECT COALESCE(l.nation, o.nation) AS nation,
               COALESCE(l.yr, o.yr) AS yr,
               COALESCE(l.rev_line, 0) AS rev_line,
               COALESCE(o.rev_orders, 0) AS rev_orders
        FROM l_by l FULL OUTER JOIN o_by o
          ON l.nation = o.nation AND l.yr = o.yr
    ),
    r AS (
        SELECT nation, yr, rev_line, rev_orders,
               CASE WHEN rev_orders = 0 THEN NULL
                    ELSE CAST(rev_line AS DOUBLE)
                         / CAST(rev_orders AS DOUBLE) END AS ratio
        FROM joined
    )
    SELECT nation, yr,
           CAST(ROUND(rev_line, 2) AS DOUBLE) + 0.0 AS rev_line,
           CAST(ROUND(rev_orders, 2) AS DOUBLE) + 0.0 AS rev_orders,
           ROUND(ratio + 1e-9, 4) + 0.0 AS ratio,
           ROUND(ratio - LAG(ratio) OVER (PARTITION BY nation
                                          ORDER BY yr ASC)
                 + 1e-9, 4) + 0.0 AS ratio_yoy
    FROM r
"""


@register("q27_cross_channel_ratio", oracle=_CROSS_CHANNEL_SQL)
def q27_cross_channel_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q27 (TPC-DS q75 shape): cross-channel comparison — the
    lineitem channel (supplier-nation revenue) FULL-OUTER-joined
    against the orders channel (customer-nation totals) per
    (nation, year), channel ratio, and its year-over-year delta via
    LAG. The DS move TPC-H lacks: joining two INDEPENDENT aggregates
    of different facts on a composite grain, then windowing the
    joined grid.

    Cross-engine: both channel sums are exact DECIMAL; the ratio and
    its YoY delta are identical double chains rounded at the edge;
    zero-denominator cells are NULL (not NaN) on both engines; the
    first year's LAG is NULL on both.

    Scale shape: two map-side-combined fact aggregates collapse to
    the <= |nations| x |years| grid; the full-outer join and the LAG
    window run on that bounded grid (the window partitions on
    nation)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    l_by = (
        li.join(o.select("o_orderkey", "o_orderdate"),
                li["l_orderkey"] == F.col("o_orderkey"))
        .join(maybe_broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(maybe_broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("yr"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            ).alias("rev_line")
        )
    )
    o_by = (
        o.join(maybe_broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(maybe_broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("yr"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("rev_orders"))
    )
    joined = (
        l_by.join(o_by, ["nation", "yr"], "full")
        .select(
            "nation",
            "yr",
            F.coalesce("rev_line", F.lit(0).cast("decimal(18,6)")).alias("rev_line"),
            F.coalesce("rev_orders", F.lit(0).cast("decimal(18,6)")).alias(
                "rev_orders"
            ),
        )
    )
    r = joined.withColumn(
        "ratio",
        F.when(F.col("rev_orders") == 0, F.lit(None).cast("double")).otherwise(
            F.col("rev_line").cast("double") / F.col("rev_orders").cast("double")
        ),
    )
    win = W.partitionBy("nation").orderBy(F.col("yr").asc())
    return r.select(
        "nation",
        "yr",
        (F.round("rev_line", 2).cast("double") + 0.0).alias("rev_line"),
        (F.round("rev_orders", 2).cast("double") + 0.0).alias("rev_orders"),
        (F.round(F.col("ratio") + 1e-9, 4) + 0.0).alias("ratio"),
        (
            F.round(F.col("ratio") - F.lag("ratio").over(win) + 1e-9, 4) + 0.0
        ).alias("ratio_yoy"),
    )
