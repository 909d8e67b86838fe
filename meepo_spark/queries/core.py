"""Core relational queries: flagship pricing summary (TPC-H Q1 shape),
projection/filter (P1-P2), hash aggregation (G1-G2, G6), scalar
function families F1-F4.  SURVEY.md §2.B.

Every query reads via ``catalog.table`` so filters/projections push
into the parquet scan (verified by tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meepo_spark.catalog import table
from meepo_spark.registry import register


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           ROUND(AVG(l_quantity), 2)                                        AS avg_qty,
           ROUND(AVG(l_extendedprice), 2)                                   AS avg_price,
           ROUND(AVG(l_discount), 2)                                        AS avg_disc,
           COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: scan → filter → hash-agg (partial+final) → sort.

    Catalyst pushes the shipdate filter into the scan; the two-phase
    aggregate keeps the shuffle to |groups| rows per partition — the
    plan is shuffle-minimal at any scale.
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "p1_project_compute",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand)                              AS brand_uc,
           ROUND(p_retailprice * 1.1, 2)               AS price_with_tax,
           p_size * 2                                  AS double_size
    FROM part
    """,
)
def p1_project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: projection with computed/aliased columns — column pruning
    means the scan reads only 4 of part's 6 columns."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_uc"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("price_with_tax"),
        (F.col("p_size") * 2).alias("double_size"),
    )


@register(
    "p2_filter_complex",
    oracle="""
    SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 2) AS total
    FROM orders
    WHERE (o_orderstatus IN ('O', 'F'))
      AND o_totalprice BETWEEN 1000 AND 100000
      AND o_orderpriority LIKE '1%'
      AND o_custkey IS NOT NULL
    """,
)
def p2_filter_complex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: conjunction / IN / BETWEEN / LIKE / IS NULL — all pushed to
    the parquet reader as native filters."""
    o = table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_totalprice").between(1000, 100000)
        & F.col("o_orderpriority").like("1%")
        & F.col("o_custkey").isNotNull()
    ).select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("total"),
    )


@register(
    "g1_agg_basic",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*)                          AS n_orders,
           ROUND(SUM(o_totalprice), 2)       AS sum_total,
           ROUND(AVG(o_totalprice), 2)       AS avg_total,
           ROUND(MIN(o_totalprice), 2)       AS min_total,
           ROUND(MAX(o_totalprice), 2)       AS max_total
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def g1_agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1: the five base aggregates under one hash-agg."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_total"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_total"),
        F.round(F.min("o_totalprice"), 2).alias("min_total"),
        F.round(F.max("o_totalprice"), 2).alias("max_total"),
    )


@register(
    "g2_distinct_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT)  AS n_supps,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT)  AS n_parts
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def g2_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2: distinct aggregates — Catalyst expands to a two-level agg
    (expand + partial) so the distinct sets never centralize."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )


@register(
    "g6_maxby_collect",
    oracle="""
    SELECT c_mktsegment,
           MAX_BY(c_name, c_acctbal)   AS richest_customer,
           MIN_BY(c_name, c_acctbal)   AS poorest_customer,
           ROUND(MAX(c_acctbal), 2)    AS max_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def g6_maxby_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G6: max_by/min_by (meepo's event-store 'latest event per pk'
    lookup is exactly max_by(row, ts) — A9)."""
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.max_by("c_name", "c_acctbal").alias("richest_customer"),
        F.min_by("c_name", "c_acctbal").alias("poorest_customer"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
    )


@register(
    "f1_string_funcs",
    oracle="""
    SELECT s_suppkey,
           LOWER(s_name)                                   AS name_lc,
           SUBSTRING(s_name, 1, 8)                         AS name_prefix,
           LENGTH(s_name)                                  AS name_len,
           CONCAT_WS('|', s_name, CAST(s_nationkey AS VARCHAR)) AS tagged,
           TRIM(CONCAT(' ', s_name, ' '))                  AS trimmed
    FROM supplier
    """,
)
def f1_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: string function family."""
    s = table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.lower("s_name").alias("name_lc"),
        F.substring("s_name", 1, 8).alias("name_prefix"),
        F.length("s_name").alias("name_len"),
        F.concat_ws("|", F.col("s_name"), F.col("s_nationkey").cast("string")).alias("tagged"),
        F.trim(F.concat(F.lit(" "), F.col("s_name"), F.lit(" "))).alias("trimmed"),
    )


@register(
    "f2_datetime_funcs",
    oracle="""
    SELECT CAST(YEAR(o_orderdate) AS INT)                       AS order_year,
           CAST(MONTH(o_orderdate) AS INT)                      AS order_month,
           COUNT(*)                                             AS n,
           ROUND(SUM(o_totalprice), 2)                          AS total
    FROM orders
    GROUP BY 1, 2
    """,
)
def f2_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: date/time extraction + group by derived time key (the batch
    shape of a tumbling-window rollup)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@register(
    "f3_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(ABS(l_extendedprice - 1000.0), 2)        AS abs_diff,
           CAST(FLOOR(l_quantity) AS BIGINT)              AS qty_floor,
           CAST(MOD(l_orderkey, 7) AS BIGINT)             AS key_mod,
           ROUND(LN(l_extendedprice + 1), 2)              AS log_price,
           ROUND(POW(l_discount, 2), 4)                   AS disc_sq
    FROM lineitem
    WHERE l_linenumber = 1 AND l_orderkey % 100 = 0
    """,
)
def f3_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: math function family (Spark pmod == DuckDB MOD on the
    non-negative fixture keys)."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_linenumber") == 1) & (F.col("l_orderkey") % 100 == 0)).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 1000.0), 2).alias("abs_diff"),
        F.floor("l_quantity").alias("qty_floor"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("long").alias("key_mod"),
        F.round(F.log(F.col("l_extendedprice") + 1), 2).alias("log_price"),
        F.round(F.pow("l_discount", F.lit(2)), 4).alias("disc_sq"),
    )


@register(
    "f4_conditional_funcs",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal > 5000 THEN 'high'
                WHEN c_acctbal > 1000 THEN 'mid'
                ELSE 'low' END                        AS bal_tier,
           COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg_masked,
           ROUND(GREATEST(c_acctbal, 0.0), 2)         AS bal_nonneg,
           ROUND(LEAST(c_acctbal, 9999.0), 2)         AS bal_capped
    FROM customer
    """,
)
def f4_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: when/otherwise, coalesce/nullif, greatest/least."""
    c = table(spark, sf_dir, "customer")
    tier = (
        F.when(F.col("c_acctbal") > 5000, "high")
        .when(F.col("c_acctbal") > 1000, "mid")
        .otherwise("low")
    )
    return c.select(
        "c_custkey",
        tier.alias("bal_tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")).alias(
            "seg_masked"
        ),
        F.round(F.greatest(F.col("c_acctbal"), F.lit(0.0)), 2).alias("bal_nonneg"),
        F.round(F.least(F.col("c_acctbal"), F.lit(9999.0)), 2).alias("bal_capped"),
    )


@register(
    "g8_event_bitmask",
    oracle="""
    WITH coded AS (
        SELECT user_id,
               CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
                               WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
                               WHEN 'view' THEN 16 ELSE 0 END AS bit
        FROM events
    )
    SELECT user_id,
           CAST(BIT_OR(bit) AS BIGINT) AS type_mask,
           CAST(BIT_COUNT(BIT_OR(bit)) AS INT) AS n_types,
           CAST(BIT_OR(bit) & 4 > 0 AS BOOLEAN) AS ever_purchased
    FROM coded
    GROUP BY user_id
    """,
)
def g8_event_bitmask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G8: bitmap aggregate — per-user activity bitmask via BIT_OR of
    one-hot codes (the bitmap-index / segment-membership pattern:
    'which of the 5 event types has this user ever produced').

    At scale this is the cheapest possible multi-membership rollup:
    the per-user state is ONE integer regardless of event count, the
    aggregate is associative/commutative (perfect partial+final
    map-side combine), and downstream segment predicates
    (`mask & 4 > 0`) are pure integer ops — no joins, no
    collect_set blowup. Everything is exact integers."""
    ev = table(spark, sf_dir, "events")
    bit = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "error", 2)
        .when(F.col("event_type") == "purchase", 4)
        .when(F.col("event_type") == "signup", 8)
        .when(F.col("event_type") == "view", 16)
        .otherwise(0)
    )
    return (
        ev.select("user_id", bit.alias("bit"))
        .groupBy("user_id")
        .agg(F.bit_or("bit").alias("type_mask"))
        .select(
            "user_id",
            "type_mask",
            F.bit_count("type_mask").cast("int").alias("n_types"),
            (F.col("type_mask").bitwiseAND(4) > 0).alias("ever_purchased"),
        )
    )


@register(
    "f11_date_arith",
    oracle="""
    WITH d AS (
        SELECT CAST(o_orderdate AS DATE) AS od FROM orders
    )
    SELECT quarter(od) AS q,
           CAST(dayofweek(od) + 1 AS INT) AS dow,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(od) + INTERVAL 90 DAY AS DATE)::VARCHAR AS first_deadline,
           MAX(last_day(od + INTERVAL 3 MONTH))::VARCHAR AS last_due_eom,
           CAST(MIN(weekofyear(od)) AS INT) AS first_week,
           CAST(MAX(weekofyear(od)) AS INT) AS last_week
    FROM d
    GROUP BY 1, 2
    """,
)
def f11_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11: date-interval arithmetic family — date_add, add_months
    with end-of-month clamping (last_day), quarter, ISO week, and
    day-of-week, the calendar kernel of every SLA / fiscal-period
    report. Both engines clamp month arithmetic the same way
    (Jan 31 + 1 month = Feb 28/29) and use ISO week numbering;
    day-of-week bases differ (Spark: Sunday=1, DuckDB: Sunday=0),
    normalized explicitly in the oracle rather than silently. The
    oracle hoists the +90d outside MIN (valid: date+interval is
    monotone) — DuckDB 1.0.0 miscomputes a MAX(last_day(od+3mo))
    sibling when another `od + INTERVAL` aggregate is in the same
    SELECT, and the hoist sidesteps that.

    All expressions are codegen'd date arithmetic on the scan — the
    group-by cardinality (4 quarters × 7 days) is constant, so this
    is a pure map-side-combine aggregate at any scale."""
    d = table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("od")
    )
    return d.groupBy(
        F.quarter("od").alias("q"),
        F.dayofweek("od").alias("dow"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.date_add("od", 90)).cast("string").alias("first_deadline"),
        F.max(F.last_day(F.add_months("od", 3)))
        .cast("string")
        .alias("last_due_eom"),
        F.min(F.weekofyear("od")).alias("first_week"),
        F.max(F.weekofyear("od")).alias("last_week"),
    )


@register(
    "f12_null_semantics",
    oracle="""
    WITH x AS (
        SELECT c_custkey,
               NULLIF(c_mktsegment, 'BUILDING') AS seg,
               CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
        FROM customer
    )
    SELECT seg,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(bal) AS BIGINT) AS n_bal,
           CAST(COUNT(*) - COUNT(bal) AS BIGINT) AS n_null_bal,
           ROUND(CAST(SUM(COALESCE(bal, 0.0)) AS DOUBLE) + 1e-9, 2)
               AS sum_bal0,
           CAST(SUM(CASE WHEN seg IS NOT DISTINCT FROM NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_hits
    FROM x
    GROUP BY seg
    """,
)
def f12_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12: NULL semantics family — NULLIF-manufactured nulls, the
    COUNT(*) vs COUNT(col) distinction, COALESCE defaulting,
    null-safe equality (Spark `<=>` / SQL IS NOT DISTINCT FROM), and
    the SQL rule that GROUP BY collects all NULLs into ONE group.
    Engines disagreeing on any of these silently corrupts every
    downstream aggregate, which is why the family gets its own
    oracle rather than riding along in other queries.

    All single-scan, constant group cardinality — null checks are
    free codegen'd predicates."""
    c = table(spark, sf_dir, "customer")
    x = c.select(
        "c_custkey",
        F.nullif("c_mktsegment", F.lit("BUILDING")).alias("seg"),
        F.when(F.col("c_acctbal") < 0, None)
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
    )
    return x.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("bal").alias("n_bal"),
        (F.count(F.lit(1)) - F.count("bal")).alias("n_null_bal"),
        F.round(F.sum(F.coalesce("bal", F.lit(0.0))) + 1e-9, 2).alias(
            "sum_bal0"
        ),
        F.sum(
            F.when(F.col("seg").eqNullSafe(F.lit(None).cast("string")), 1)
            .otherwise(0)
        ).alias("n_nullsafe_hits"),
    )

@register(
    "f15_collation",
    # UTF8_LCASE equality for ASCII == equality of lower(); the oracle
    # groups by lower() and must see the identical census.
    oracle="""
    WITH styled AS (
        SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_brand)
                    ELSE p_brand END AS b
        FROM part
    )
    SELECT lower(b) AS brand_ci,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT b) AS BIGINT) AS n_case_variants
    FROM styled GROUP BY lower(b)
    """,
)
def f15_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15: collation-aware grouping (Spark 4 `collate`) — the brand
    column is deliberately case-mangled (every even partkey
    uppercased), then grouped under UTF8_LCASE so case variants
    reunify WITHOUT rewriting the data. The census reports each
    case-insensitive group's size and how many raw spellings it
    absorbed — the mixed-feed normalization problem (same vendor
    spelled three ways) solved at the comparison layer instead of
    with lower() scattered through every predicate.

    The output key is lower()ed explicitly because a collated
    group's REPRESENTATIVE is whichever spelling a task saw first —
    nondeterministic across partitionings; the collation defines
    equality, not canonical form. Pure map-side projection + one
    hash aggregate (collation comparisons run in codegen)."""
    styled = table(spark, sf_dir, "part").select(
        F.when(
            F.col("p_partkey") % 2 == 0, F.upper(F.col("p_brand"))
        )
        .otherwise(F.col("p_brand"))
        .alias("b")
    )
    keyed = styled.select(
        F.collate(F.col("b"), "UTF8_LCASE").alias("k"),
        F.col("b").alias("raw"),  # stays UTF8_BINARY for variant count
    )
    return (
        keyed.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.countDistinct("raw").alias("n_case_variants"),
        )
        .select(
            F.lower(F.collate(F.col("k"), "UTF8_BINARY")).alias("brand_ci"),
            "n_parts",
            "n_case_variants",
        )
    )


@register(
    "f16_calendar_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(quarter(CAST(o_orderdate AS DATE)) AS INT)     AS qtr,
           CAST(dayofyear(CAST(o_orderdate AS DATE)) AS INT)   AS doy,
           CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INT)  AS iso_week,
           CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS INT) AS dow,
           STRFTIME(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
               AS month_end,
           STRFTIME(CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE),
                    '%Y-%m-%d') AS plus_2_months,
           STRFTIME(date_trunc('quarter', CAST(o_orderdate AS DATE)),
                    '%Y-%m-%d') AS quarter_start
    FROM orders WHERE o_orderkey < 200
    """,
)
def f16_calendar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F16: the calendar-arithmetic function family — quarter /
    day-of-year / ISO week / day-of-week / month-end / add_months /
    quarter truncation. The cross-engine traps, pinned: Spark's
    dayofweek is 1=Sunday while DuckDB's is 0=Sunday (+1 in the
    oracle); add_months and DuckDB's +INTERVAL MONTH both CLAMP to
    the target month's last day (Jan 31 + 1 → Feb 29), so they
    agree; weekofyear is ISO-8601 on both. All map-side projections;
    dates render as strings (the FIXTURES.md timestamp discipline)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.quarter(d).alias("qtr"),
        F.dayofyear(d).alias("doy"),
        F.weekofyear(d).alias("iso_week"),
        F.dayofweek(d).alias("dow"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.add_months(d, 2), "yyyy-MM-dd").alias("plus_2_months"),
        F.date_format(F.date_trunc("quarter", d), "yyyy-MM-dd").alias(
            "quarter_start"
        ),
    )


@register(
    "f19_regexp_family",
    oracle=r"""
    WITH x AS (
        SELECT event_type, props,
               TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k_val,
               len(regexp_extract_all(props, '\d'))                   AS n_digits,
               regexp_replace(props, '\d+', '#', 'g')                 AS masked,
               CASE WHEN regexp_matches(event_type, '^(view|click)$')
                    THEN 1 ELSE 0 END                                 AS is_vc
        FROM events
    )
    SELECT event_type,
           COUNT(*)                                  AS n,
           CAST(SUM(k_val) AS BIGINT)                AS k_sum,
           CAST(SUM(n_digits) AS BIGINT)             AS total_digits,
           CAST(COUNT(DISTINCT masked) AS BIGINT)    AS n_masked_patterns,
           CAST(MAX(is_vc) AS BIGINT)                AS matches_vc
    FROM x GROUP BY event_type
    """,
)
def f19_regexp_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F19: the regexp function family over the JSON-ish props column
    — capture-group extraction (regexp_extract + cast), match counting
    (regexp_count), masking rewrite (regexp_replace, the PII-scrub
    primitive), and anchored alternation matching (rlike). Patterns
    stay in the \\d / anchored-literal subset where Java regex and
    DuckDB's RE2 agree exactly. All four run JVM-side inside one
    projection — a 100 TB log-scrubbing pass is this exact plan: scan
    → regex projection → small aggregate, no Python anywhere."""
    e = table(spark, sf_dir, "events")
    x = e.select(
        "event_type",
        # try_cast both sides: regexp_extract yields '' on no-match, and
        # CAST('' AS BIGINT) raises under ANSI (Spark bare session) and
        # in DuckDB — a future fixture with a props row missing "k"
        # would turn a value difference into an engine crash.
        F.regexp_extract("props", r'"k": (\d+)', 1).try_cast("long").alias("k_val"),
        F.regexp_count("props", F.lit(r"\d")).alias("n_digits"),
        F.regexp_replace("props", r"\d+", "#").alias("masked"),
        F.col("event_type").rlike("^(view|click)$").cast("long").alias("is_vc"),
    )
    return x.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k_val").cast("long").alias("k_sum"),
        F.sum("n_digits").cast("long").alias("total_digits"),
        F.countDistinct("masked").alias("n_masked_patterns"),
        F.max("is_vc").alias("matches_vc"),
    )


@register(
    "f20_try_arithmetic",
    oracle="""
    WITH t AS (
        SELECT l_returnflag,
               CAST(FLOOR(l_extendedprice) AS BIGINT) AS p,
               CAST(l_quantity AS BIGINT) - 25        AS q
        FROM lineitem
    )
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN q = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero_div,
           CAST(SUM(CASE WHEN q <> 0
                         THEN CAST(FLOOR(p * 1.0 / q) AS BIGINT) END)
               AS BIGINT) AS sum_floor_div,
           CAST(SUM(CASE WHEN q <> 0 THEN p % q END) AS BIGINT)
               AS sum_mod
    FROM t
    GROUP BY l_returnflag
    """,
)
def f20_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/ANSI surface: the Spark 4 ``try_*`` error-safe arithmetic
    family — under ANSI mode (which this repo's driver sessions run),
    a plain division or mod by zero RAISES; ``try_divide``/``try_mod``
    return NULL instead, which is the migration path for pipelines
    moving from legacy to ANSI semantics without wrapping every
    expression in CASE. The fixture hits the error path for real
    (l_quantity = 25 → divisor 0 on ~2% of lineitem).

    The DuckDB oracle states the NULL-on-zero contract explicitly
    (CASE WHEN q <> 0) — the hash match proves try_* implements
    exactly that. Integer-exact cross-engine: each quotient is
    FLOORed per row before the sum (identical IEEE division both
    engines, math-floor on negatives verified both engines), and %
    is sign-of-dividend in both. NULL rows (zero divisors) drop out
    of both engines' SUMs identically."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor("l_extendedprice").cast("long").alias("p"),
        (F.col("l_quantity").cast("long") - 25).alias("q"),
    )
    d = F.try_divide(F.col("p").cast("double"), F.col("q").cast("double"))
    m = F.try_mod("p", "q")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("q") == 0, 1).otherwise(0)).alias("n_zero_div"),
        F.sum(F.floor(d).cast("long")).alias("sum_floor_div"),
        F.sum(m).alias("sum_mod"),
    )
