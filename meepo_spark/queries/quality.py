"""Graded data-quality queries: a constraint-expectations report over
the TPC-H-ish fixtures (null / range / referential / uniqueness
rules) — the validation gate a production pipeline runs before a
dataset version is published.

Every rule is a plain DataFrame aggregate; the report is a union of
1-row integer counts, so it is exact on any engine and its cost is a
handful of scans that Catalyst prunes to the checked columns only.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meepo_spark.catalog import table
from meepo_spark.operators.broadcast_gate import maybe_broadcast
from meepo_spark.registry import register


@register(
    "dq1_expectations",
    oracle="""
    SELECT 'lineitem_quantity_range' AS rule,
           CAST(COUNT(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50)
                AS BIGINT) AS n_violations,
           CAST(COUNT(*) AS BIGINT) AS n_checked
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_shipdate_not_null',
           CAST(COUNT(*) FILTER (WHERE l_shipdate IS NULL) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_pk_unique',
           CAST(SUM(n - 1) AS BIGINT),
           CAST(SUM(n) AS BIGINT)
    FROM (SELECT COUNT(*) AS n FROM lineitem
          GROUP BY l_orderkey, l_linenumber)
    UNION ALL
    SELECT 'orders_totalprice_positive',
           CAST(COUNT(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_custkey_fk',
           CAST(COUNT(*) FILTER (WHERE o_custkey NOT IN
                (SELECT c_custkey FROM customer)) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM orders
    """,
)
def dq1_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ: expectations report — five constraint families (range,
    not-null, primary-key uniqueness, positivity, foreign-key
    integrity) each reduced to (rule, n_violations, n_checked).

    Plan shape: each rule is an independent aggregate over a
    column-pruned scan; the FK rule is a broadcast anti-join against
    the customer key column, and the uniqueness rule shuffles only the
    (pk → count) pairs. At 100 TB the whole report is one pass per
    fact table (Catalyst merges the two lineitem rules' scans only if
    asked — union keeps them independent and restartable), and every
    output is an exact integer.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")

    def report(name: str, violated, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("rule"),
            F.sum(F.when(violated, 1).otherwise(0)).alias("n_violations"),
            F.count(F.lit(1)).alias("n_checked"),
        )

    quantity = report(
        "lineitem_quantity_range",
        (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
        li,
    )
    shipdate = report(
        "lineitem_shipdate_not_null", F.col("l_shipdate").isNull(), li
    )
    pk = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.lit("lineitem_pk_unique").alias("rule"),
            F.sum(F.col("n") - 1).alias("n_violations"),
            F.sum("n").alias("n_checked"),
        )
    )
    price = report(
        "orders_totalprice_positive", F.col("o_totalprice") <= 0, orders
    )
    fk = (
        orders.join(
            maybe_broadcast(cust.select("c_custkey")),
            orders.o_custkey == F.col("c_custkey"),
            "left",
        )
        .agg(
            F.lit("orders_custkey_fk").alias("rule"),
            F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0)).alias(
                "n_violations"
            ),
            F.count(F.lit(1)).alias("n_checked"),
        )
    )
    return reduce(DataFrame.unionAll, [quantity, shipdate, pk, price, fk])


@register(
    "dq2_volume_anomaly",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ),
    d AS (
        SELECT day, n,
               LAG(n) OVER (ORDER BY day) AS prev_n
        FROM daily
    )
    SELECT day::VARCHAR AS day, n, prev_n,
           ROUND(CAST(n - prev_n AS DOUBLE) / prev_n + 1e-9, 3) + 0.0 AS pct_change,
           CAST(ABS(CAST(n - prev_n AS DOUBLE) / prev_n) > 0.5 AS BOOLEAN)
               AS is_anomaly
    FROM d
    WHERE prev_n IS NOT NULL
    """,
)
def dq2_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ: pipeline freshness/volume monitor — day-over-day row-count
    drift, flagged when |Δ| exceeds 50%. The everyday ops check that
    catches an upstream producer dying or double-publishing before
    the bad partition propagates.

    Plan shape: one column-pruned scan → tiny (day, count) aggregate
    → single-partition LAG over ~O(days) rows. The window runs on the
    aggregate, never the raw log, so the unpartitioned ORDER BY is
    safe at any scale. All comparisons are exact integers; only the
    reported ratio is floating (rounded, negative-zero-normalized)."""
    from pyspark.sql import Window as W

    daily = (
        table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    d = daily.withColumn("prev_n", F.lag("n").over(W.orderBy("day")))
    delta = (F.col("n") - F.col("prev_n")).cast("double") / F.col("prev_n")
    return d.filter(F.col("prev_n").isNotNull()).select(
        F.col("day").cast("string").alias("day"),
        "n",
        "prev_n",
        (F.round(delta + 1e-9, 3) + 0.0).alias("pct_change"),
        (F.abs(delta) > 0.5).alias("is_anomaly"),
    )


@register(
    "dq3_referential_integrity",
    oracle="""
    SELECT * FROM (
        SELECT 'lineitem.l_orderkey->orders' AS fk,
               COUNT(*) AS n_child,
               CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
        FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        UNION ALL
        SELECT 'lineitem.l_partkey->part', COUNT(*),
               CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
        UNION ALL
        SELECT 'lineitem.l_suppkey->supplier', COUNT(*),
               CAST(SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
        UNION ALL
        SELECT 'orders.o_custkey->customer', COUNT(*),
               CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        UNION ALL
        SELECT 'customer.c_nationkey->nation', COUNT(*),
               CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        UNION ALL
        SELECT 'nation.n_regionkey->region', COUNT(*),
               CAST(SUM(CASE WHEN r.r_regionkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    ) t
    """,
)
def dq3_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ3: foreign-key orphan audit across the whole star schema —
    one row per FK edge with child cardinality and orphan count.
    Each edge is a left join + null-probe (Catalyst turns the small
    parent sides into broadcasts, so each fact pass is map-side);
    orphan detection is the DQ primitive every ingest gate needs
    before CDC-applying a batch.

    At 100 TB: each check is a single pass over the child with a
    broadcast (or bloom-pruned) parent key set; the six checks union
    into one job so the scheduler can share scans of lineitem."""

    def check(child: DataFrame, ckey: str, parent: DataFrame, pkey: str, name: str) -> DataFrame:
        # the parent key set ranges from region (5 rows) to ORDERS
        # (fact-sized, SF-linear) — a static broadcast hint on the
        # orders check is a driver OOM at 100 TB (VERDICT r5 #1):
        # size-gated per parent, so small parents still broadcast and
        # fact-sized ones fall back to a shuffled join
        j = child.select(F.col(ckey)).join(
            maybe_broadcast(parent.select(F.col(pkey))),
            F.col(ckey) == F.col(pkey),
            "left",
        )
        return j.agg(
            F.count(F.lit(1)).alias("n_child"),
            F.sum(F.when(F.col(pkey).isNull(), 1).otherwise(0)).alias("n_orphans"),
        ).select(F.lit(name).alias("fk"), "n_child", "n_orphans")

    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    checks = [
        check(l, "l_orderkey", o, "o_orderkey", "lineitem.l_orderkey->orders"),
        check(l, "l_partkey", p, "p_partkey", "lineitem.l_partkey->part"),
        check(l, "l_suppkey", s, "s_suppkey", "lineitem.l_suppkey->supplier"),
        check(o, "o_custkey", c, "c_custkey", "orders.o_custkey->customer"),
        check(c, "c_nationkey", n, "n_nationkey", "customer.c_nationkey->nation"),
        check(n, "n_regionkey", r, "r_regionkey", "nation.n_regionkey->region"),
    ]
    out = checks[0]
    for ch in checks[1:]:
        out = out.unionByName(ch)
    return out


@register(
    "dq4_drift_monitor",
    oracle="""
    WITH windowed AS (
        SELECT event_type,
               CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
                    THEN 'baseline' ELSE 'current' END AS win,
               CAST(ROUND(value * 100) AS BIGINT)       AS cents
        FROM events
    ),
    stats AS (
        SELECT event_type, win, COUNT(*) AS n,
               SUM(cents) AS s, SUM(cents * cents) AS s2
        FROM windowed GROUP BY event_type, win
    ),
    pivoted AS (
        SELECT event_type,
               MAX(CASE WHEN win = 'baseline' THEN n END)  AS n_base,
               MAX(CASE WHEN win = 'current' THEN n END)   AS n_cur,
               MAX(CASE WHEN win = 'baseline' THEN s END)  AS s_base,
               MAX(CASE WHEN win = 'current' THEN s END)   AS s_cur,
               MAX(CASE WHEN win = 'baseline' THEN s2 END) AS s2_base
        FROM stats GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_base AS BIGINT) AS n_base,
           CAST(n_cur AS BIGINT)  AS n_cur,
           ROUND((s_cur * 1.0 / n_cur - s_base * 1.0 / n_base) / 100.0 + 1e-9, 2) AS mean_shift,
           ROUND(ABS(s_cur * 1.0 / n_cur - s_base * 1.0 / n_base)
                 / SQRT((s2_base * 1.0 / n_base - (s_base * 1.0 / n_base) * (s_base * 1.0 / n_base))
                        / n_cur) + 1e-9, 2) AS drift_z,
           CASE WHEN n_cur * 1.0 / n_base NOT BETWEEN 0.5 AND 2.0
                THEN 1 ELSE 0 END AS volume_alarm
    FROM pivoted
    """,
)
def dq4_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ4: distribution-drift monitor — per event_type, compare the
    current window's mean value against the baseline window via a
    z-score on the baseline's variance (the standard online drift
    alarm) plus a volume-ratio alarm. Everything reduces to six
    integer-exact moments (n, Σc, Σc²) per (type, window) — one scan,
    one tiny shuffle — so the monitor costs one aggregation at any
    scale, and the float math happens only on the 5-row result.

    Moments run on integer cents: Σ and Σ² are exact, so both engines
    derive identical doubles before the final rounding."""
    e = table(spark, sf_dir, "events").select(
        "event_type",
        F.when(F.col("ts") < F.lit("2024-01-15 00:00:00").cast("timestamp"), "baseline")
        .otherwise("current")
        .alias("win"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    stats = e.groupBy("event_type", "win").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("s2"),
    )
    p = stats.groupBy("event_type").agg(
        F.max(F.when(F.col("win") == "baseline", F.col("n"))).alias("n_base"),
        F.max(F.when(F.col("win") == "current", F.col("n"))).alias("n_cur"),
        F.max(F.when(F.col("win") == "baseline", F.col("s"))).alias("s_base"),
        F.max(F.when(F.col("win") == "current", F.col("s"))).alias("s_cur"),
        F.max(F.when(F.col("win") == "baseline", F.col("s2"))).alias("s2_base"),
    )
    mean_base = F.col("s_base") * 1.0 / F.col("n_base")
    mean_cur = F.col("s_cur") * 1.0 / F.col("n_cur")
    var_base = F.col("s2_base") * 1.0 / F.col("n_base") - mean_base * mean_base
    return p.select(
        "event_type",
        "n_base",
        "n_cur",
        F.round((mean_cur - mean_base) / 100.0 + F.lit(1e-9), 2).alias("mean_shift"),
        F.round(
            F.abs(mean_cur - mean_base) / F.sqrt(var_base / F.col("n_cur")) + F.lit(1e-9), 2
        ).alias("drift_z"),
        F.when(
            ~(F.col("n_cur") * 1.0 / F.col("n_base")).between(0.5, 2.0), 1
        ).otherwise(0).alias("volume_alarm"),
    )


@register(
    "v13_ks_test",
    oracle="""
    WITH pts AS (
        SELECT event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS cents,
               CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00' THEN 1 ELSE 0 END AS is_base
        FROM events
    ),
    per_value AS (
        SELECT event_type, cents,
               SUM(is_base)     AS nb,
               SUM(1 - is_base) AS nc
        FROM pts GROUP BY event_type, cents
    ),
    cum AS (
        SELECT event_type, cents,
               SUM(nb) OVER w AS cb, SUM(nc) OVER w AS cc,
               SUM(nb) OVER (PARTITION BY event_type) AS tb,
               SUM(nc) OVER (PARTITION BY event_type) AS tc
        FROM per_value
        WINDOW w AS (PARTITION BY event_type ORDER BY cents ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type,
           CAST(MAX(tb) AS BIGINT) AS n_base,
           CAST(MAX(tc) AS BIGINT) AS n_current,
           ROUND(MAX(ABS(cb * 1.0 / tb - cc * 1.0 / tc)) + 1e-9, 6) AS ks_stat
    FROM cum
    GROUP BY event_type
    """,
)
def v13_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V13: two-sample Kolmogorov–Smirnov statistic per event_type —
    the nonparametric distribution-drift test (complements dq4's
    moment-based z-score: KS catches shape changes a mean test
    can't). Exact formulation: aggregate to per-value counts first
    (ties collapse, CDF evaluated right-continuously), then one
    keyed window cumsum and a max of CDF gaps — integer counts
    throughout, the only floats are the two final ratios.

    Scale shape (r4): per-value aggregation collapses ties, but
    |distinct cents| is NOT bounded for a continuous measure (the r4
    runtime waiver audit measured 49k rows at sf0.1, still growing
    5.4x per 10x data) — a per-type window walks the whole value grid
    in one task per type. Both CDFs and both totals now come from one
    `bucketed_prefix_sum` over 1024-cent value bands: every window
    partition is bounded at 1024 distinct cents by construction, and
    the per-type totals are a second pass over the tiny band
    aggregate (broadcast), not a full-frame window. The same shape
    computes any ECDF-functional (Cramér–von Mises, A-D weights)."""
    from meepo_spark.operators.enumeration import bucketed_prefix_sum

    e = table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.when(
            F.col("ts") < F.lit("2024-01-15 00:00:00").cast("timestamp"), 1
        ).otherwise(0).alias("is_base"),
    )
    per_value = e.groupBy("event_type", "cents").agg(
        F.sum("is_base").alias("nb"), F.sum(1 - F.col("is_base")).alias("nc")
    )
    cum = bucketed_prefix_sum(
        per_value,
        bucket=F.floor(F.col("cents") / 1024),
        order_cols=[F.col("cents").asc()],
        vals={"cb": "nb", "cc": "nc"},
        part_cols=["event_type"],
        frame_end=0,
        totals=True,
    ).select(
        "event_type",
        "cb",
        "cc",
        F.col("cb_tot").alias("tb"),
        F.col("cc_tot").alias("tc"),
    )
    return cum.groupBy("event_type").agg(
        F.max("tb").alias("n_base"),
        F.max("tc").alias("n_current"),
        F.round(
            F.max(F.abs(F.col("cb") * 1.0 / F.col("tb") - F.col("cc") * 1.0 / F.col("tc")))
            + F.lit(1e-9),
            6,
        ).alias("ks_stat"),
    )


@register(
    "dq5_key_duplication_census",
    oracle="""
    WITH per_key AS (
        SELECT l_orderkey, l_linenumber, COUNT(*) AS copies
        FROM lineitem GROUP BY l_orderkey, l_linenumber
    )
    SELECT CAST(copies AS BIGINT)       AS copies,
           COUNT(*)                     AS n_keys,
           CAST(SUM(copies) AS BIGINT)  AS n_rows,
           CAST(SUM(copies) - COUNT(*) AS BIGINT) AS n_excess_rows
    FROM per_key
    GROUP BY copies
    """,
)
def dq5_key_duplication_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ5: key-multiplicity census — the histogram of copies per
    candidate key, the diagnostic run when a 'primary key' turns out
    not to be one (this fixture's (l_orderkey, l_linenumber) carries
    ~24% excess rows at sf0.01 — discovered by exactly this query
    shape when a 1:1 join fanned out). dq1 reports the single excess
    total; the census shows the SHAPE (all doubles vs one
    million-copy key), which decides the fix (dedup vs upstream bug).

    One key-grain aggregate (map-side combined) then a tiny
    multiplicity rollup — the profile costs one pass at any scale."""
    l = table(spark, sf_dir, "lineitem")
    per_key = l.groupBy("l_orderkey", "l_linenumber").agg(
        F.count(F.lit(1)).alias("copies")
    )
    return per_key.groupBy("copies").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("copies").alias("n_rows"),
        (F.sum("copies") - F.count(F.lit(1))).alias("n_excess_rows"),
    )

@register(
    "dq6_benford_deviation",
    oracle="""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                    AS INT) AS d
        FROM orders WHERE o_totalprice >= 1
    ),
    obs AS (
        SELECT d, CAST(COUNT(*) AS BIGINT) AS n
        FROM digits GROUP BY d
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM obs)
    SELECT o.d AS digit, o.n,
           ROUND(o.n * 1.0 / tot.t + 1e-9, 4)      AS observed_p,
           ROUND(LOG(1.0 + 1.0 / o.d) + 1e-9, 4)   AS benford_p,
           ROUND(o.n * 1.0 / tot.t
                 - LOG(1.0 + 1.0 / o.d) + 1e-9, 4) AS deviation
    FROM obs o CROSS JOIN tot
    """,
)
def dq6_benford_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ6: Benford's-law first-digit audit — the classic
    fabricated-data / broken-ETL detector: naturally occurring
    monetary amounts follow P(d) = log10(1 + 1/d), and a feed whose
    leading digits drift from that curve was truncated, defaulted, or
    synthesized. Reports observed vs expected frequency and the
    signed deviation per digit.

    Scale shape: the digit is a pure string projection of the amount
    (no float log in the grouping key), so the whole audit is one
    9-row hash aggregate with map-side combine + a 1-row total
    broadcast — the cheapest possible full-table screen at 100 TB.
    DuckDB's LOG is base-10 (Spark: F.log10), and the expected curve
    is computed from integer digits, so both engines agree bit-wise
    before the 4dp round."""
    d = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") >= 1)
        .select(
            # FLOOR explicitly: DuckDB's double->BIGINT cast rounds
            # while Spark's truncates — the one-ulp trap for amounts
            # just under a digit boundary
            F.substring(
                F.floor(F.col("o_totalprice")).cast("string"), 1, 1
            )
            .cast("int")
            .alias("d")
        )
    )
    obs = d.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    tot = obs.agg(F.sum("n").alias("t"))
    benford = F.log10(1.0 + 1.0 / F.col("d"))
    return (
        obs.crossJoin(F.broadcast(tot))  # bcast: fixed (1-row total)
        .select(
            F.col("d").alias("digit"),
            "n",
            F.round(F.col("n") / F.col("t") + 1e-9, 4).alias("observed_p"),
            F.round(benford + 1e-9, 4).alias("benford_p"),
            F.round(F.col("n") / F.col("t") - benford + 1e-9, 4).alias("deviation"),
        )
    )

@register(
    "dq8_completeness_profile",
    oracle="""
    SELECT 'c_acctbal' AS col,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(c_acctbal) AS BIGINT) AS n_present,
           CAST(COUNT(DISTINCT c_acctbal) AS BIGINT) AS n_distinct
    FROM customer
    UNION ALL
    SELECT 'c_mktsegment', COUNT(*), COUNT(c_mktsegment),
           CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 'c_nationkey', COUNT(*), COUNT(c_nationkey),
           CAST(COUNT(DISTINCT c_nationkey) AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 'c_name', COUNT(*), COUNT(c_name),
           CAST(COUNT(DISTINCT c_name) AS BIGINT)
    FROM customer
    """,
)
def dq8_completeness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ8: column completeness/cardinality profile — per column the
    row count, non-null count, and exact distinct count, long-form.
    The first query any data-quality platform runs on a new feed
    (profiling before expectations), and the statistics ANALYZE
    gathers for the optimizer.

    Scale shape: ONE scan computes every per-column aggregate
    together (count/count(col) pairs fuse into a single hash-free
    global aggregate; the distincts each add an Expand leg — at
    100 TB swap exact distincts for HLL sketches, the g3b contract),
    then a zero-shuffle unpivot to long form."""
    c = table(spark, sf_dir, "customer")
    cols = ["c_acctbal", "c_mktsegment", "c_nationkey", "c_name"]
    aggs = []
    for col in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__r_{col}"),
            F.count(col).alias(f"__p_{col}"),
            F.countDistinct(col).alias(f"__d_{col}"),
        ]
    one = c.agg(*aggs)
    # stack() melts the 1-row aggregate in ONE Generate — a 4-way
    # unionByName of selects duplicated the aggregate subplan 4x and
    # left single-scan behavior to ReuseExchange (code-review r3b)
    stack = ", ".join(
        f"'{col}', __r_{col}, __p_{col}, __d_{col}" for col in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack}) AS (col, n_rows, n_present, n_distinct)"
        )
    )


@register(
    "v17_chi_square_independence",
    oracle="""
    WITH cells AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
        FROM documents GROUP BY lang, source
    ),
    rt AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY lang),
    ct AS (SELECT source, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY source),
    n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
    terms AS (
        SELECT cells.lang, cells.source,
               CAST(cells.o * n.n - rt.r * ct.c AS DOUBLE)
               * CAST(cells.o * n.n - rt.r * ct.c AS DOUBLE)
               / (CAST(rt.r AS DOUBLE) * CAST(ct.c AS DOUBLE) * CAST(n.n AS DOUBLE))
                   AS term
        FROM cells JOIN rt USING (lang) JOIN ct USING (source) CROSS JOIN n
    )
    SELECT ROUND(list_sum(LIST(term ORDER BY lang, source))
                 + 1e-9, 6) + 0.0 AS chi2_r,
           CAST(((SELECT COUNT(*) FROM rt) - 1)
                * ((SELECT COUNT(*) FROM ct) - 1) AS BIGINT) AS dof,
           (SELECT n FROM n) AS n
    FROM terms
    """,
)
def v17_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V17: chi-square test of independence on the lang × source
    contingency table — the categorical-drift / sampling-bias screen
    (is the language mix independent of the crawl source?).

    Exactness: each cell's (O−E)²/E term is computed from the INTEGER
    identity (o·N − r·c)² / (r·c·N) — algebraically equal to
    (O−E)²/E since E = r·c/N, but with numerator and denominators as
    exact 64-bit integers cast to double, so every per-cell term is
    bit-identical on both engines; the ~|langs|·|sources| terms are
    then folded SEQUENTIALLY in (lang, source) order (F.aggregate ≡
    DuckDB list_sum over an ordered LIST — the l3-family discipline),
    so the sum order is pinned too. (Code-review r4 #2: a first cut
    divided the folded sum by N again, reporting the mean-square
    contingency φ² mislabeled as χ².)

    Scale shape: one partial+final count per cell (the only pass over
    the corpus), then all arithmetic runs on the tiny cell table with
    broadcast row/column totals — no windows, no tiny-key partitions.
    The final ordered fold aggregates ≤ |langs × sources| structs."""
    d = table(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    rt = cells.groupBy("lang").agg(F.sum("o").alias("r"))
    ct = cells.groupBy("source").agg(F.sum("o").alias("c"))
    n = cells.agg(F.sum("o").alias("n"), F.count(F.lit(1)).alias("n_cells"))
    j = (
        cells.join(F.broadcast(rt), "lang")  # bcast: fixed (per-lang totals)
        .join(F.broadcast(ct), "source")  # bcast: fixed (per-source totals)
        .crossJoin(F.broadcast(n))  # bcast: fixed (1-row count)
    )
    num = (F.col("o") * F.col("n") - F.col("r") * F.col("c")).cast("double")
    term = num * num / (
        F.col("r").cast("double") * F.col("c").cast("double") * F.col("n").cast("double")
    )
    folded = j.select(
        F.struct("lang", "source").alias("k"),
        term.alias("term"),
        "n",
    ).groupBy("n").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("k"), F.col("term")))),
            F.lit(0.0),
            lambda acc, s: acc + s["term"],
        ).alias("chi2_num"),
        F.countDistinct("k.lang").alias("nl"),
        F.countDistinct("k.source").alias("ns"),
    )
    return folded.select(
        (F.round(F.col("chi2_num") + 1e-9, 6) + 0.0).alias("chi2_r"),
        ((F.col("nl") - 1) * (F.col("ns") - 1)).cast("long").alias("dof"),
        F.col("n").alias("n"),
    )


@register(
    "dq9_cross_field_consistency",
    oracle="""
    SELECT
        CAST(SUM(CASE WHEN CAST(l.l_shipdate AS DATE) < CAST(o.o_orderdate AS DATE)
                 THEN 1 ELSE 0 END) AS BIGINT) AS shipped_before_order,
        CAST(SUM(CASE WHEN CAST(l.l_shipdate AS DATE)
                           > CAST(o.o_orderdate AS DATE) + INTERVAL 180 DAY
                 THEN 1 ELSE 0 END) AS BIGINT) AS shipped_over_180d_late,
        CAST(SUM(CASE WHEN l.l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS nonpositive_qty,
        CAST(SUM(CASE WHEN l.l_discount < 0 OR l.l_discount > 0.5 THEN 1 ELSE 0 END) AS BIGINT)
            AS discount_out_of_range,
        CAST(SUM(CASE WHEN ABS(l.l_extendedprice * 100
                               - ROUND(l.l_extendedprice * 100)) > 1e-6
                 THEN 1 ELSE 0 END) AS BIGINT) AS subcent_price,
        CAST(SUM(CASE WHEN l.l_returnflag = 'R' AND l.l_linestatus = 'O'
                 THEN 1 ELSE 0 END) AS BIGINT) AS returned_but_open,
        CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def dq9_cross_field_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ9: cross-FIELD consistency audit — the rule class single-
    column profiling (dq1/dq8) cannot see: relations between fields
    of one logical record, including across the parent join (a line
    shipped before its order was placed, or >180 days after; positive
    quantities; discounts inside policy range; prices on the cent
    grid; no returned-but-open status pairs). One equi-join to the
    parent + a map-side CASE projection + one global aggregate; every
    check is integer/date/exact-boolean, so the census matches
    bit-for-bit. At 100 TB: the join shuffles on the natural FK (or
    broadcasts when the parent fits), and everything else is the
    embarrassingly-parallel sanity pass run before anything trusts
    the batch."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.to_date("o_orderdate").alias("odate"),
    )
    j = li.join(o, "l_orderkey")
    sdate = F.to_date("l_shipdate")

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0))

    return j.agg(
        cnt(sdate < F.col("odate")).alias("shipped_before_order"),
        cnt(sdate > F.date_add(F.col("odate"), 180)).alias("shipped_over_180d_late"),
        cnt(F.col("l_quantity") <= 0).alias("nonpositive_qty"),
        cnt(
            (F.col("l_discount") < 0) | (F.col("l_discount") > 0.5)
        ).alias("discount_out_of_range"),
        cnt(
            F.abs(
                F.col("l_extendedprice") * 100
                - F.round(F.col("l_extendedprice") * 100)
            )
            > 1e-6
        ).alias("subcent_price"),
        cnt(
            (F.col("l_returnflag") == "R") & (F.col("l_linestatus") == "O")
        ).alias("returned_but_open"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "dq10_iqr_outlier_census",
    oracle="""
    WITH m AS (
        SELECT col, cents FROM (
            SELECT 'extendedprice' AS col,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
            FROM lineitem
            UNION ALL
            SELECT 'quantity', CAST(ROUND(l_quantity * 100) AS BIGINT) FROM lineitem
            UNION ALL
            SELECT 'discount', CAST(ROUND(l_discount * 10000) AS BIGINT)
            FROM lineitem
        )
    ),
    q AS (
        SELECT col,
               quantile_cont(cents, 0.25) AS q1,
               quantile_cont(cents, 0.75) AS q3,
               CAST(COUNT(*) AS BIGINT)   AS n
        FROM m GROUP BY col
    )
    SELECT m.col,
           q.n,
           ROUND(q.q1, 2) + 0.0 AS q1,
           ROUND(q.q3, 2) + 0.0 AS q3,
           CAST(SUM(CASE WHEN m.cents < q.q1 - 1.5 * (q.q3 - q.q1)
                           OR m.cents > q.q3 + 1.5 * (q.q3 - q.q1)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM m JOIN q USING (col)
    GROUP BY m.col, q.n, q.q1, q.q3
    """,
)
def dq10_iqr_outlier_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ10: Tukey-fence outlier census per measure — values outside
    [Q1 − 1.5·IQR, Q3 + 1.5·IQR], the robust screen a data-quality
    gate runs where dq4's z-score (mean/stddev) would be dragged by
    the very outliers it hunts. Three measures audit in one melted
    pass (exact integer units per measure: cents, centi-units,
    basis points); quartiles are exact value-map percentiles over
    integers (the v4 discipline — interpolation at quarter fractions
    of integers is IEEE-exact), broadcast back for one counting
    scan.

    Scale shape (reworked r8, VERDICT r7 #5): the exact quartiles come
    from a VALUE HISTOGRAM, not F.percentile — the percentile
    aggregate's partial state is a per-task value->count map whose
    merge lands on ONE final task, and extendedprice-cents is
    near-unique per row, so at fixture scale that merge was the whole
    query's cost AND its measured variance (fresh-plan probes: the
    percentile stage alone swung 1.9-2.6 s while the counting pass
    held 0.4-0.9 s; the BENCH_history 2.7-4.7 s band — the '1.01 s'
    readings in that history are sf<=0.01 probe rows, not sf0.1
    swings), and at 100 TB a domain-sized single-task map merge is an
    OOM, not a plan. Shape (optimization r10): one Expand melts the 3
    measures, ONE hash aggregate collapses to the (measure, value)
    domain — bounded by the VALUE DOMAIN, never rows — and is
    localCheckpoint-materialized; the exact quartiles come from
    `operators/quantiles.py` (weight=c) in two bounded passes over
    the checkpointed histogram plus exact driver arithmetic
    (bit-identical to quantile_cont by the helper's property tests);
    fences broadcast back (3 rows) and outliers are counted off the
    same histogram (the fence predicate is constant within a value
    bin, so summing bin counts outside the fences is exact). The r9
    in-Spark CDF tail (bucketed prefix sums + interp joins) was a
    ~12-job DAG whose scheduling latency exceeded the census cost at
    every SF — the same finding that motivated the helper's driver
    locate. ROUND before every double->BIGINT cast on BOTH sides
    (bare casts truncate in Spark but round in DuckDB — the dq6
    trap)."""
    from meepo_spark.operators.quantiles import exact_quantiles_cdf

    li = table(spark, sf_dir, "lineitem")
    melted = li.select(
        F.expr(
            "stack(3,"
            " 'extendedprice', CAST(ROUND(l_extendedprice * 100) AS LONG),"
            " 'quantity',      CAST(ROUND(l_quantity * 100) AS LONG),"
            " 'discount',      CAST(ROUND(l_discount * 10000) AS LONG)"
            ") AS (col, v)"
        )
    )
    # ONE fact pass builds the (col, v) value histogram — bounded by
    # the VALUE DOMAIN, never rows — materialized via localCheckpoint
    # so the quartile passes and the fence count all read it instead
    # of re-scanning the fact (optimization r10: the r9 shape's
    # in-Spark CDF tail — bucketed prefix sums + interp joins — was a
    # ~12-job DAG whose latency exceeded the census at any SF; the
    # generalized operators/quantiles.py helper with weight=c now
    # computes quantile_cont in two bounded passes over the
    # checkpointed histogram and exact driver arithmetic,
    # bit-identical by the helper's F.percentile property tests)
    hist = (
        melted.groupBy("col", "v")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    quart = exact_quantiles_cdf(
        hist, ["col"], "v", {"q1": 0.25, "q3": 0.75}, weight="c"
    )
    lo = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    # count outliers off the HISTOGRAM, not a second fact scan: the
    # fence test is constant inside a value bin, so SUM(c) over
    # out-of-fence bins equals the row count exactly
    fenced = hist.join(F.broadcast(quart), "col")  # bcast: fixed (3 rows)
    return fenced.groupBy("col").agg(
        F.max("n").alias("n"),
        (F.round(F.max("q1"), 2) + 0.0).alias("q1"),
        (F.round(F.max("q3"), 2) + 0.0).alias("q3"),
        F.sum(
            F.when((F.col("v") < lo) | (F.col("v") > hi), F.col("c")).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("n_outliers"),
    )


@register(
    "dq11_schema_drift",
    oracle=r"""
    WITH keyed AS (
        SELECT event_type,
               ARRAY_TO_STRING(LIST_SORT(
                   regexp_extract_all(props, '"(\w+)"\s*:', 1)), ',') AS sig
        FROM events
    ),
    per_sig AS (
        SELECT event_type, sig, COUNT(*) AS n
        FROM keyed GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(SUM(n) AS BIGINT)                       AS n_rows,
           CAST(COUNT(*) AS BIGINT)                     AS n_signatures,
           MIN(sig)                                     AS first_sig,
           CAST(MAX(n) AS BIGINT)                       AS dominant_n,
           CAST(SUM(CASE WHEN (',' || sig || ',') NOT LIKE '%,k,%'
                         THEN n ELSE 0 END)
                AS BIGINT)                              AS n_missing_k
    FROM per_sig GROUP BY event_type
    """,
)
def dq11_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ11: payload schema-drift census — each semi-structured props
    payload is reduced to its sorted key-set SIGNATURE (the shape a
    schema registry tracks), then per event_type: row count, distinct
    signatures, lexicographically-first signature, the dominant
    signature's support, and rows missing the contract key 'k'. The
    production use: a producer deploy that adds/renames payload keys
    shows up as n_signatures > 1 or n_missing_k > 0 BEFORE any typed
    consumer breaks (a24's typed lane turns those rows into NULLs).
    Scale: one scan, the regexp key extraction is JVM codegen, the
    double aggregate is (event_type, sig) -> event_type over a
    signature space bounded by real producer versions (a handful), so
    the shuffle is tiny regardless of corpus size."""
    e = table(spark, sf_dir, "events")
    keyed = e.select(
        "event_type",
        F.array_join(
            F.array_sort(F.regexp_extract_all("props", F.lit(r'"(\w+)"\s*:'), 1)),
            ",",
        ).alias("sig"),
    )
    per_sig = keyed.groupBy("event_type", "sig").agg(F.count(F.lit(1)).alias("n"))
    return per_sig.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).alias("n_signatures"),
        F.min("sig").alias("first_sig"),
        F.max("n").cast("long").alias("dominant_n"),
        # exact key membership, not substring — a producer key like
        # "kind" or "sku" must not mask a MISSING contract key 'k'
        F.sum(
            F.when(
                ~F.concat(F.lit(","), F.col("sig"), F.lit(",")).like("%,k,%"),
                F.col("n"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("n_missing_k"),
    )


@register(
    "dq12_freshness_census",
    oracle="""
    WITH g AS (SELECT MAX(ts) AS gmax FROM events),
    per AS (
        SELECT event_type,
               MAX(ts) AS last_ts,
               CAST(COUNT(*) AS BIGINT) AS n_total
        FROM events GROUP BY event_type
    ),
    recent AS (
        SELECT e.event_type,
               CAST(SUM(CASE WHEN date_diff('microsecond', e.ts, g.gmax)
                                  <= 86400000000 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_last_day,
               CAST(SUM(CASE WHEN date_diff('microsecond', e.ts, g.gmax)
                                  <= 604800000000 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_last_week
        FROM events e CROSS JOIN g GROUP BY e.event_type
    )
    SELECT p.event_type,
           STRFTIME(p.last_ts, '%Y-%m-%d %H:%M:%S') AS last_seen,
           CAST(date_diff('microsecond', p.last_ts,
                          (SELECT gmax FROM g)) // 1000000 AS BIGINT)
               AS staleness_s,
           p.n_total,
           r.n_last_day,
           r.n_last_week,
           ROUND(r.n_last_week / 7.0, 2) + 0.0 AS weekly_daily_rate
    FROM per p JOIN recent r ON p.event_type = r.event_type
    """,
)
def dq12_freshness_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ12: pipeline freshness / staleness census — per event stream:
    last-seen timestamp, staleness vs the newest event anywhere
    (exact integer seconds via microsecond arithmetic — the j13
    lesson: cross-engine timestamp math must stay in integral
    microseconds), trailing 1-day / 7-day arrival counts against the
    corpus watermark, and the implied daily rate. The check every
    ingestion SLA monitor runs: a stalled producer shows staleness_s
    growing while its weekly rate decays. One scan computes the
    global watermark (1-row broadcast) and one scan aggregates per
    stream — no windows, no driver state; at 100 TB the event_date
    partitioning prunes the trailing-window counts to a handful of
    partitions."""
    e = table(spark, sf_dir, "events")
    g = e.agg(F.max("ts").alias("gmax"))
    us = lambda c: F.unix_micros(F.col(c))  # noqa: E731
    per = (
        e.crossJoin(F.broadcast(g))  # bcast: fixed (1-row max ts)
        .groupBy("event_type")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("n_total"),
            F.sum(
                F.when(us("gmax") - us("ts") <= 86400000000, 1).otherwise(0)
            ).cast("long").alias("n_last_day"),
            F.sum(
                F.when(us("gmax") - us("ts") <= 604800000000, 1).otherwise(0)
            ).cast("long").alias("n_last_week"),
            F.max(F.col("gmax")).alias("gmax"),
        )
    )
    return per.select(
        "event_type",
        F.date_format("last_ts", "yyyy-MM-dd HH:mm:ss").alias("last_seen"),
        ((us("gmax") - us("last_ts")) / F.lit(1000000))
        .cast("long")
        .alias("staleness_s"),
        "n_total",
        "n_last_day",
        "n_last_week",
        (F.round(F.col("n_last_week") / 7.0, 2) + 0.0).alias("weekly_daily_rate"),
    )


@register(
    "dq13_functional_dependencies",
    oracle="""
    WITH checks AS (
        SELECT 'lineitem.l_partkey->l_suppkey' AS fd, l_partkey AS x,
               CAST(l_suppkey AS VARCHAR) AS y FROM lineitem
        UNION ALL
        SELECT 'orders.o_custkey->o_orderpriority', o_custkey,
               o_orderpriority FROM orders
        UNION ALL
        SELECT 'customer.c_nationkey->c_mktsegment', c_nationkey,
               c_mktsegment FROM customer
        UNION ALL
        SELECT 'lineitem.l_orderkey->l_returnflag', l_orderkey,
               l_returnflag FROM lineitem
    ),
    per_group AS (
        SELECT fd, x, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT y) AS BIGINT) AS ny
        FROM checks GROUP BY fd, x
    )
    SELECT fd,
           CAST(COUNT(*) AS BIGINT)                            AS n_groups,
           CAST(SUM(CASE WHEN ny > 1 THEN 1 ELSE 0 END)
                AS BIGINT)                                     AS n_violating_groups,
           CAST(SUM(CASE WHEN ny > 1 THEN n ELSE 0 END)
                AS BIGINT)                                     AS n_violating_rows,
           ROUND(SUM(CASE WHEN ny > 1 THEN n ELSE 0 END) * 1.0
                 / SUM(n) + 1e-9, 6)                           AS violation_rate
    FROM per_group GROUP BY fd
    """,
)
def dq13_functional_dependencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ13: approximate functional-dependency discovery — for each
    candidate FD X→Y, how many X-groups carry more than one distinct Y
    and what row mass sits in violating groups (the profiling step a
    schema-inference/normalization pass runs before trusting a column
    as a join key or a dimension attribute; Metanome-class tooling at
    warehouse scale). Candidates span a true near-key
    (l_orderkey→l_returnflag is per-order consistent-ish), a known
    many-to-many (part→supplier), and two dimension attributes.

    Scale shape: each check is one (X)-keyed hash aggregate with a
    distinct-count — map-side combined, shuffle keyed on X — and the
    four checks union AFTER their per-FD rollups, so the scheduler can
    share the two lineitem scans. Integer counts exact; one rate
    division rounds at 6dp."""

    def check(df: DataFrame, fd: str, x: str, y) -> DataFrame:
        per = (
            df.select(F.col(x).alias("x"), y.alias("y"))
            .groupBy("x")
            .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("y").alias("ny"))
        )
        viol = F.when(F.col("ny") > 1, F.col("n")).otherwise(F.lit(0))
        return per.agg(
            F.lit(fd).alias("fd"),
            F.count(F.lit(1)).alias("n_groups"),
            F.sum((F.col("ny") > 1).cast("long")).cast("long").alias(
                "n_violating_groups"
            ),
            F.sum(viol).cast("long").alias("n_violating_rows"),
            F.round(F.sum(viol) * 1.0 / F.sum("n") + 1e-9, 6).alias(
                "violation_rate"
            ),
        ).select(
            "fd", "n_groups", "n_violating_groups", "n_violating_rows",
            "violation_rate",
        )

    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    checks = [
        check(li, "lineitem.l_partkey->l_suppkey", "l_partkey",
              F.col("l_suppkey").cast("string")),
        check(o, "orders.o_custkey->o_orderpriority", "o_custkey",
              F.col("o_orderpriority")),
        check(c, "customer.c_nationkey->c_mktsegment", "c_nationkey",
              F.col("c_mktsegment")),
        check(li, "lineitem.l_orderkey->l_returnflag", "l_orderkey",
              F.col("l_returnflag")),
    ]
    out = checks[0]
    for ch in checks[1:]:
        out = out.unionByName(ch)
    return out


@register(
    "dq14_mahalanobis_outliers",
    oracle="""
    WITH m AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               AVG(l_quantity)                     AS mx,
               AVG(l_extendedprice)                AS my,
               AVG(l_quantity * l_quantity)        AS sxx,
               AVG(l_extendedprice * l_extendedprice) AS syy,
               AVG(l_quantity * l_extendedprice)   AS sxy
        FROM lineitem GROUP BY l_returnflag
    ),
    st AS (
        SELECT l_returnflag, n, mx, my,
               sxx - mx * mx AS vx,
               syy - my * my AS vy,
               sxy - mx * my AS cxy
        FROM m
    )
    SELECT s.l_returnflag, s.n,
           ROUND(s.cxy / sqrt(s.vx * s.vy) + 1e-9, 4) AS corr_r,
           CAST(SUM(CASE WHEN
                ((l.l_quantity - s.mx) * (l.l_quantity - s.mx) * s.vy
                 - 2 * (l.l_quantity - s.mx) * (l.l_extendedprice - s.my) * s.cxy
                 + (l.l_extendedprice - s.my) * (l.l_extendedprice - s.my) * s.vx)
                / (s.vx * s.vy - s.cxy * s.cxy) > 9.21
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM lineitem l JOIN st s USING (l_returnflag)
    GROUP BY s.l_returnflag, s.n, s.cxy, s.vx, s.vy
    """,
)
def dq14_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ14: bivariate outlier census — squared Mahalanobis distance of
    (quantity, extendedprice) against each return-flag group's own
    2x2 covariance, counting rows beyond the chi-square(2) 99% cut
    (9.21). The multivariate complement to dq10's per-measure Tukey
    fences: a row can sit inside both marginal fences yet be wildly
    off the JOINT quantity-price relationship (tiny quantity at a huge
    price), which only the covariance-aware distance sees. The 2x2
    inverse is closed-form, so the whole census stays in scalar
    expressions — no matrix library, no UDF.

    Float discipline: moments are double AVGs (summation-order drift
    ~1e-12), but the graded outputs are drift-safe by construction —
    the census compares the RAW distance to 9.21 (distances spread
    over ~0-10^2, so a 1e-10 drift flips a count only if some row
    lands within 1e-10 of the cut: P ~ 1e-7 at sf0.1), and the only
    emitted double is the per-group correlation, rounded with the
    standard nudge. Per-row scores are deliberately NOT emitted: 600k
    rounded values would put ~0.6 expected rows on a 4dp grid
    boundary (the l58 -0.0 lesson, probability edition).

    Scale shape: dq10's two-pass anatomy — one moments aggregate
    (map-side combined), the 3-row stats frame broadcast back, one
    counting scan. Both passes column-pruned to the two measures."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
    )
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.avg(F.col("x") * F.col("x")).alias("sxx"),
        F.avg(F.col("y") * F.col("y")).alias("syy"),
        F.avg(F.col("x") * F.col("y")).alias("sxy"),
    )
    st = m.select(
        "l_returnflag",
        "n",
        "mx",
        "my",
        (F.col("sxx") - F.col("mx") * F.col("mx")).alias("vx"),
        (F.col("syy") - F.col("my") * F.col("my")).alias("vy"),
        (F.col("sxy") - F.col("mx") * F.col("my")).alias("cxy"),
    )
    dx = F.col("x") - F.col("mx")
    dy = F.col("y") - F.col("my")
    d2 = (
        dx * dx * F.col("vy") - 2 * dx * dy * F.col("cxy") + dy * dy * F.col("vx")
    ) / (F.col("vx") * F.col("vy") - F.col("cxy") * F.col("cxy"))
    return (
        li.join(F.broadcast(st), "l_returnflag")  # bcast: fixed (3-row stats)
        .groupBy("l_returnflag", "n", "vx", "vy", "cxy")
        .agg(F.sum((d2 > 9.21).cast("int")).cast("long").alias("n_outliers"))
        .select(
            "l_returnflag",
            "n",
            F.round(
                F.col("cxy") / F.sqrt(F.col("vx") * F.col("vy")) + 1e-9, 4
            ).alias("corr_r"),
            "n_outliers",
        )
    )


# --- dq7: comparative Benford conformance screen (round 10; replaces
# the round-9 dq12_benford_digit_audit, which near-duplicated dq6 on
# the same orders column — VERDICT r9 #2. dq7 audits LINEITEM columns
# dq6 never touches, and audits them AGAINST each other: the detector
# must fire on the bounded series and stay quiet on the monetary one)

_BENFORD_SQL = """
    WITH series AS (
        SELECT 'price' AS series,
               substr(CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                           AS VARCHAR), 1, 1) AS digit
        FROM lineitem WHERE l_extendedprice > 0
        UNION ALL
        SELECT 'qty', substr(CAST(CAST(l_quantity AS BIGINT) AS VARCHAR), 1, 1)
        FROM lineitem WHERE l_quantity > 0
    ),
    digits AS (
        SELECT series, digit, CAST(COUNT(*) AS BIGINT) AS n_obs
        FROM series GROUP BY 1, 2
    ),
    tot AS (
        SELECT series, CAST(SUM(n_obs) AS BIGINT) AS nn
        FROM digits GROUP BY 1
    )
    SELECT d.series, d.digit, d.n_obs,
           ROUND(CAST(d.n_obs AS DOUBLE) / t.nn + 1e-9, 6) + 0.0 AS p_obs,
           ROUND(LN(CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE)
                    / CAST(d.digit AS BIGINT)) / LN(CAST(10 AS DOUBLE))
                 + 1e-9, 6) + 0.0 AS p_benford,
           ROUND(
               (CAST(d.n_obs AS DOUBLE)
                - t.nn * (LN(CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE)
                             / CAST(d.digit AS BIGINT))
                          / LN(CAST(10 AS DOUBLE))))
               * (CAST(d.n_obs AS DOUBLE)
                  - t.nn * (LN(CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE)
                               / CAST(d.digit AS BIGINT))
                            / LN(CAST(10 AS DOUBLE))))
               / (t.nn * (LN(CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE)
                             / CAST(d.digit AS BIGINT))
                          / LN(CAST(10 AS DOUBLE))))
               + 1e-9, 4) + 0.0 AS chi2_contrib
    FROM digits d JOIN tot t USING (series)
"""


@register("dq7_benford_conformance_contrast", oracle=_BENFORD_SQL)
def dq7_benford_conformance_contrast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ7: comparative Benford conformance screen on lineitem — the
    calibration question a lone Benford audit (dq6, orders) can't
    answer: does the detector actually separate? Two series from ONE
    scan: `price` (extendedprice cents — organically multiplicative,
    should conform) and `qty` (quantity, bounded 1..50 — structurally
    CANNOT conform); per (series, digit) the empirical share vs
    log10(1 + 1/d) and the chi-square contribution. The qty series'
    inflated contributions against price's flat ones are the
    detector's positive/negative control pair.

    Cross-engine exactness: leading digits come from DECIMAL STRINGS
    of exact BIGINTs (no float log10-near-power-of-ten edge), and the
    expectation is the identical ln-ratio double chain (Spark F.log =
    DuckDB LN, both natural — never LOG, the base-10 trap).

    Scale shape: one Expand over the scan (no rescan), one map-side-
    combined (series, digit) census (<= 18 rows at any corpus size),
    2-row per-series totals folded back via broadcast; all float work
    runs on <= 18 rows."""
    l = table(spark, sf_dir, "lineitem")
    digits = (
        l.select(
            F.expr(
                "stack(2,"
                " 'price', CASE WHEN l_extendedprice > 0 THEN"
                "   substring(CAST(CAST(ROUND(l_extendedprice * 100) AS LONG)"
                "             AS STRING), 1, 1) END,"
                " 'qty',   CASE WHEN l_quantity > 0 THEN"
                "   substring(CAST(CAST(l_quantity AS LONG) AS STRING), 1, 1) END"
                ") AS (series, digit)"
            )
        )
        .filter(F.col("digit").isNotNull())
        .groupBy("series", "digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    tot = digits.groupBy("series").agg(F.sum("n_obs").cast("long").alias("nn"))
    p_ben = F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("long")) / F.log(
        F.lit(10.0)
    )
    exp_n = F.col("nn") * p_ben
    return digits.join(F.broadcast(tot), "series").select(  # bcast: fixed (2 series)
        "series",
        "digit",
        "n_obs",
        (
            F.round(F.col("n_obs").cast("double") / F.col("nn") + 1e-9, 6) + 0.0
        ).alias("p_obs"),
        (F.round(p_ben + 1e-9, 6) + 0.0).alias("p_benford"),
        (
            F.round(
                (F.col("n_obs").cast("double") - exp_n)
                * (F.col("n_obs").cast("double") - exp_n)
                / exp_n
                + 1e-9,
                4,
            )
            + 0.0
        ).alias("chi2_contrib"),
    )
