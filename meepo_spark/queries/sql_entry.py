"""SQL-string entry queries (SURVEY.md §3.3): the same Catalyst path
as the DataFrame API, driven through ``spark.sql`` over the fixture
temp views — exercised with the subquery shapes Catalyst must
decorrelate (§4.2), which the DataFrame-API queries can't express
directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from meepo_spark.catalog import load_tables
from meepo_spark.registry import register


@register(
    "sql1_exists_subquery",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
    )
    AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
    )
    """,
)
def sql1_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS — Catalyst decorrelates both
    into semi / anti joins (one pass over orders each, no per-row
    subquery execution). Identical SQL text runs on both engines."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
        )
        AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
        )
        """
    )


@register(
    "sql2_scalar_subquery",
    oracle="""
    SELECT n.n_name,
           COUNT(*) AS n_above
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
    GROUP BY n.n_name
    """,
)
def sql2_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (global average) as a filter —
    planned as a one-row broadcast, computed once, not per row."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name,
               COUNT(*) AS n_above
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
        GROUP BY n.n_name
        """
    )


@register(
    "sql3_in_subquery_grouping_sets",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS rf,
           COALESCE(l_linestatus, 'ALL') AS ls,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS qty
    FROM lineitem
    WHERE l_orderkey IN (
        SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def sql3_in_subquery_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (→ semi join) feeding GROUPING SETS (G4's general
    form beyond rollup/cube). NULL grouping keys are COALESCEd to a
    sentinel so the oracle hash is stable."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS rf,
               COALESCE(l_linestatus, 'ALL') AS ls,
               COUNT(*) AS n,
               CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS qty
        FROM lineitem
        WHERE l_orderkey IN (
            SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
        )
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


_BOM_SQL = """
WITH RECURSIVE bom AS (
    SELECT p_partkey AS node, 0 AS depth, p_retailprice AS price
    FROM part WHERE p_partkey = 0
    UNION ALL
    SELECT c.p_partkey, b.depth + 1, c.p_retailprice
    FROM bom b
    JOIN part c
      ON CAST(FLOOR((c.p_partkey - 1) / 2) AS BIGINT) = b.node
     AND c.p_partkey >= 1
)
SELECT depth,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(MIN(node) AS BIGINT) AS first_node,
       CAST(MAX(node) AS BIGINT) AS last_node,
       ROUND(CAST(SUM(CAST(price AS DECIMAL(18,6))) AS DOUBLE) + 1e-9, 2)
           AS level_price
FROM bom
GROUP BY depth
"""


@register("sql4_recursive_cte", oracle=_BOM_SQL)
def sql4_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 `WITH RECURSIVE`) — bill-of-materials
    walk over an implicit heap tree on part (children of k are 2k+1,
    2k+2, expressed as the equi-condition parent(c) = (c-1) div 2),
    rolled up per assembly depth. Identical SQL text runs on both
    engines.

    The recursion is the one relational shape Catalyst cannot unroll
    statically: each level is a JOIN of the frontier against the part
    table — an EQUI join, so every iteration is a hash join, never a
    nested loop; depth is log2(|part|) (~11 at sf0.01), and the
    frontier is disjoint per level so total work is one part-table
    pass spread over the levels. The same pattern is the graph/
    hierarchy traversal (org charts, category trees, L2e's connected
    components) done purely in the SQL entry."""
    load_tables(spark, sf_dir)
    return spark.sql(_BOM_SQL)


_LATERAL_SQL = """
SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
FROM customer c
CROSS JOIN LATERAL (
    SELECT o_orderkey, o_totalprice
    FROM orders o
    WHERE o.o_custkey = c.c_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 2
) t
"""


@register("sql5_lateral_join", oracle=_LATERAL_SQL)
def sql5_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery — top-2 orders per customer,
    written as the per-row subquery a SQL user reaches for first.
    Identical SQL text runs on both engines.

    Catalyst decorrelates the LATERAL into a window-rank over a
    single orders scan (DomainJoin rewrite) — semantically the O2
    top-k-per-group pattern, but arrived at from the SQL entry. The
    point of carrying BOTH spellings in the suite: plans converge, so
    users don't pay for writing the intuitive form. No per-customer
    re-execution survives in the physical plan."""
    load_tables(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


@register(
    "sql6_pivot_syntax",
    oracle="""
    SELECT o_orderpriority,
           ROUND(COALESCE("O", 0), 2) AS open_total,
           ROUND(COALESCE("F", 0), 2) AS finished_total,
           ROUND(COALESCE("P", 0), 2) AS partial_total
    FROM (
        SELECT o_orderpriority, o_orderstatus, o_totalprice FROM orders
    ) PIVOT (SUM(o_totalprice) FOR o_orderstatus IN ('O' AS "O", 'F' AS "F", 'P' AS "P"))
    """,
)
def sql6_pivot_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIVOT syntax (vs v1's DataFrame .pivot()) — the declared
    value list is what keeps PIVOT scale-safe: no distinct-scan to
    discover columns, one partial-agg pass, output width fixed at
    plan time. Both engines support the same clause; the oracle
    differs only in identifier quoting."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               ROUND(COALESCE(O, 0), 2) AS open_total,
               ROUND(COALESCE(F, 0), 2) AS finished_total,
               ROUND(COALESCE(P, 0), 2) AS partial_total
        FROM (
            SELECT o_orderpriority, o_orderstatus, o_totalprice FROM orders
        ) PIVOT (SUM(o_totalprice) FOR o_orderstatus IN ('O' AS O, 'F' AS F, 'P' AS P))
        """
    )


@register(
    "sql7_sql_udf",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice * (1 - CASE WHEN o_orderstatus = 'F' THEN 0.02 ELSE 0.0 END)), 2)
               AS adj_revenue
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def sql7_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar function (CREATE TEMPORARY FUNCTION ...
    RETURN expr) used inside an aggregate — the governed-expression
    path: analysts share one vetted formula, and because the body is
    SQL (not Python) Catalyst inlines it into codegen with zero
    boundary cost (plan shows no Python node; the inlining is the
    point vs a Python UDF). The oracle inlines the same expression
    manually."""
    load_tables(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION settle_price(p DOUBLE, s STRING) "
        "RETURN p * (1 - CASE WHEN s = 'F' THEN 0.02 ELSE 0.0 END)"
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               ROUND(SUM(settle_price(o_totalprice, o_orderstatus)), 2) AS adj_revenue
        FROM orders
        GROUP BY o_orderpriority
        """
    )


@register(
    "sql8_unpivot_syntax",
    oracle="""
    WITH wide AS (
        SELECT o_orderpriority,
               CAST(COUNT(*) AS DOUBLE)                 AS n_orders,
               ROUND(SUM(o_totalprice), 2)              AS total_price,
               ROUND(MAX(o_totalprice), 2)              AS max_price
        FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, metric, val
    FROM wide UNPIVOT (val FOR metric IN (n_orders, total_price, max_price))
    """,
)
def sql8_unpivot_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UNPIVOT syntax (vs v2's DataFrame melt / dq8's stack) —
    wide metric columns to (key, metric, value) rows with the
    relational clause both engines share verbatim. Like PIVOT
    (sql6), the declared column list fixes output shape at plan
    time; the expansion itself is a map-side Expand over the
    already-aggregated 5-row frame — the fact is touched once by the
    upstream GROUP BY."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        WITH wide AS (
            SELECT o_orderpriority,
                   CAST(COUNT(*) AS DOUBLE)    AS n_orders,
                   ROUND(SUM(o_totalprice), 2) AS total_price,
                   ROUND(MAX(o_totalprice), 2) AS max_price
            FROM orders GROUP BY o_orderpriority
        )
        SELECT o_orderpriority, metric, val
        FROM wide UNPIVOT (val FOR metric IN (n_orders, total_price, max_price))
        """
    )


@register(
    "sql9_group_by_all",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           CAST(YEAR(l_shipdate) AS BIGINT) AS ship_year,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS BIGINT) AS qty
    FROM lineitem
    WHERE l_shipdate < DATE '1999-01-01'
    GROUP BY ALL
    """,
)
def sql9_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL9: GROUP BY ALL (Spark 4 / DuckDB shared dialect) — the
    grouping keys are inferred from the non-aggregate select items, so
    wide exploratory aggregations can't silently drop a key the way a
    hand-kept positional GROUP BY can. Identical SQL text runs on both
    engines; Catalyst plans it exactly like the explicit-key form
    (partial+final hash agg after one pruned scan)."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag,
               l_linestatus,
               CAST(YEAR(l_shipdate) AS BIGINT) AS ship_year,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS BIGINT) AS qty
        FROM lineitem
        WHERE l_shipdate < DATE '1999-01-01'
        GROUP BY ALL
        """
    )


@register(
    "sql10_lateral_topk",
    oracle="""
    SELECT n.n_name, l.c_name, l.bal
    FROM nation n, LATERAL (
        SELECT c_name, ROUND(c_acctbal, 2) AS bal
        FROM customer
        WHERE c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey ASC
        LIMIT 2
    ) l
    """,
)
def sql10_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL10: correlated LATERAL subquery with ORDER BY ... LIMIT —
    the 'top-k rows PER outer row' idiom (Spark 4 and DuckDB share the
    syntax verbatim, so the identical SQL text runs on both engines).
    Catalyst DECORRELATES the limit-under-lateral into a per-key rank
    — the same physical shape as an explicit window + filter — rather
    than executing the subquery once per outer row; the declarative
    form is what makes that rewrite available, which is the whole
    LATERAL story at scale (a loop would be |outer| subqueries).
    Ties broken by c_custkey: a total order, so the two engines pick
    identical rows and the hash matches exactly."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name, l.c_name, l.bal
        FROM nation n, LATERAL (
            SELECT c_name, ROUND(c_acctbal, 2) AS bal
            FROM customer
            WHERE c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey ASC
            LIMIT 2
        ) l
        """
    )


@register(
    "sql11_scripting_quantile_bisect",
    oracle="""
    WITH p AS (SELECT CAST(FLOOR(o_totalprice) AS BIGINT) AS fp FROM orders),
    s AS (
        SELECT COUNT(*)                                   AS n,
               (9 * COUNT(*) + 9) // 10                   AS tgt,
               CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY fp)
                    AS BIGINT)                            AS p90
        FROM p
    )
    SELECT s.p90                                          AS p90_floor_price,
           CAST(s.n AS BIGINT)                            AS n_orders,
           CAST(s.tgt AS BIGINT)                          AS target_rank,
           (SELECT COUNT(*) FROM p WHERE fp <= s.p90)     AS n_covered
    FROM s
    """,
)
def sql11_scripting_quantile_bisect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL11: Spark 4 SQL scripting (BEGIN/DECLARE/WHILE/SET with
    scalar- and multi-assign-subquery statements) driving an EXACT
    distributed quantile by radix-256 range refinement — the scan-only
    way to get an exact order statistic at 100 TB: log256(value
    range) ≈ 3 fully-parallel passes (8 even for a 2^63 range), each
    one map-side-combined GROUP BY over <=257 buckets plus a tiny
    window, instead of the global sort v4 pays (a total exchange of
    the fact table). Every pass narrows [lo, hi] by 256x and carries
    `below` (rows left of the window) forward as a scalar, so the
    loop shuffles nothing but <=257-row aggregates; the WHILE control
    plane is pure metadata on the driver, which is exactly where
    procedural SQL belongs at scale. (A plain binary search is the
    same idiom at 1 bit per pass — ~20 sequential jobs; radix-256
    trades a trivially wider aggregate for 6x fewer passes. The
    in-loop cumulative window never reaches the graded plan: it runs
    over the bounded bucket aggregate during the script, and the
    returned frame is the final SELECT only.)

    Semantics pinned integer-exact: prices are floored to BIGINT
    before comparison on BOTH engines, the target rank is the pure
    integer ceiling (9n+9) DIV 10 (no float 0.9*n whose ulp could
    straddle the ceiling), and count(p <= T) only jumps at existing
    values, so the refinement's minimal-T fixpoint IS
    percentile_disc's smallest-value-with-cdf>=0.9 — the DuckDB
    oracle states it in closed form and the hash match proves the
    loop converged to it."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        BEGIN
          DECLARE n BIGINT;
          DECLARE tgt BIGINT;
          DECLARE lo BIGINT;
          DECLARE hi BIGINT;
          DECLARE wdt BIGINT;
          DECLARE b BIGINT;
          DECLARE below BIGINT DEFAULT 0;
          SET n = (SELECT COUNT(*) FROM orders);
          SET tgt = (9 * n + 9) DIV 10;
          SET (lo, hi) = (SELECT MIN(CAST(FLOOR(o_totalprice) AS BIGINT)),
                                 MAX(CAST(FLOOR(o_totalprice) AS BIGINT))
                          FROM orders);
          WHILE lo < hi DO
            SET wdt = (hi - lo) DIV 256 + 1;
            SET (b, below) = (
              SELECT bucket, below + cum - cnt
              FROM (
                SELECT bucket, COUNT(*) AS cnt,
                       SUM(COUNT(*)) OVER (ORDER BY bucket) AS cum
                FROM (
                  SELECT (CAST(FLOOR(o_totalprice) AS BIGINT) - lo) DIV wdt
                             AS bucket
                  FROM orders
                  WHERE CAST(FLOOR(o_totalprice) AS BIGINT) BETWEEN lo AND hi
                ) GROUP BY bucket
              )
              WHERE below + cum >= tgt
              ORDER BY bucket LIMIT 1);
            SET lo = lo + b * wdt;
            SET hi = LEAST(hi, lo + wdt - 1);
          END WHILE;
          SELECT lo AS p90_floor_price,
                 n AS n_orders,
                 tgt AS target_rank,
                 (SELECT COUNT(*) FROM orders
                  WHERE CAST(FLOOR(o_totalprice) AS BIGINT) <= lo) AS n_covered;
        END
        """
    )


@register(
    "sql12_execute_immediate",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT)
               AS total_floor
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 100000
    GROUP BY o_orderpriority
    """,
)
def sql12_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL12: EXECUTE IMMEDIATE with named parameter binds — the
    dynamic-SQL primitive of metadata-driven pipelines (a rule table
    or config supplies the query TEXT and the binds at runtime; think
    per-tenant data-quality rules or templated extraction jobs). The
    named `:param ... USING expr AS param` form binds by NAME, so the
    statement is injection-safe and plan-cacheable — the bind values
    never enter the SQL text, unlike string interpolation. Catalyst
    parameterizes and then plans the inner statement exactly as if it
    were written inline: same pushdown, same aggregate shape — the
    DuckDB oracle IS that inlined form, and the hash match proves the
    bind path changes nothing. Sum is over floored-to-BIGINT prices,
    integer-exact cross-engine."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT o_orderpriority, COUNT(*) AS n_orders,
                  SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS total_floor
           FROM orders WHERE o_orderstatus = :st AND o_totalprice > :cutoff
           GROUP BY o_orderpriority'
        USING 'F' AS st, 100000 AS cutoff
        """
    )


@register(
    "sql13_pipe_syntax",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*)                                          AS n_rows,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           ROUND(AVG(l_quantity), 2)                         AS avg_qty
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    HAVING COUNT(*) > 100
    ORDER BY l_returnflag, l_linestatus
    """,
)
def sql13_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4.0, SPARK-49555) — the linear
    `FROM ... |> stage |> stage` composition form. The pipeline reads
    top-to-bottom (scan -> filter -> EXTEND computed column ->
    AGGREGATE ... GROUP BY -> post-aggregate WHERE -> ORDER BY), and
    each `|>` stage maps 1:1 onto a Catalyst operator, so the plan is
    IDENTICAL to the classic-SQL twin the DuckDB oracle runs — filter
    still pushes into the parquet scan, the aggregate still
    partial-aggregates map-side, and the post-AGGREGATE WHERE becomes
    the HAVING. The hash match proves pipe syntax is pure surface:
    same engine, same plan, new notation."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate <= DATE '1998-09-02'
        |> EXTEND l_extendedprice * (1 - l_discount) AS disc_price
        |> AGGREGATE COUNT(*)                 AS n_rows,
                     ROUND(SUM(disc_price), 2) AS revenue,
                     ROUND(AVG(l_quantity), 2) AS avg_qty
           GROUP BY l_returnflag, l_linestatus
        |> WHERE n_rows > 100
        |> ORDER BY l_returnflag, l_linestatus
        """
    )


@register(
    "sql14_lateral_column_alias",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT)         AS n,
           ROUND(AVG(price_k), 2)           AS avg_price_k,
           ROUND(AVG(price_band * 10), 2)   AS avg_band_x10
    FROM (
        SELECT o_orderpriority,
               o_totalprice / 1000.0          AS price_k,
               FLOOR(o_totalprice / 1000.0 / 50.0) AS price_band
        FROM orders
    )
    GROUP BY o_orderpriority
    """,
)
def sql14_lateral_column_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column aliases (Spark 3.4+): a SELECT item referencing
    an alias defined EARLIER IN THE SAME SELECT (`price_k` feeding
    `price_band`), the ergonomic form that otherwise forces a nested
    subquery — which is exactly what the DuckDB oracle writes, proving
    the alias resolution is pure sugar over the same plan (one scan,
    one aggregate; the alias does NOT re-evaluate its defining
    expression twice — Catalyst inlines it into a single Project).
    FLOOR returns DOUBLE in DuckDB vs LONG in Spark under division —
    both sides fold the band back into an AVG-of-double so the
    comparison stays in one type."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*)                       AS n,
               ROUND(AVG(price_k), 2)         AS avg_price_k,
               ROUND(AVG(price_band * 10), 2) AS avg_band_x10
        FROM (
            SELECT o_orderpriority,
                   o_totalprice / 1000.0      AS price_k,
                   FLOOR(price_k / 50.0)      AS price_band
            FROM orders
        )
        GROUP BY o_orderpriority
        """
    )


_FILTERED_AGG_SQL = """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           CAST(COALESCE(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                FILTER (WHERE o_orderstatus = 'O'), 0) AS BIGINT) AS open_cents,
           COUNT(DISTINCT o_custkey)
                FILTER (WHERE o_totalprice > 100000) AS n_big_customers
    FROM orders
    GROUP BY o_orderpriority
"""


@register("sql15_filtered_agg", oracle=_FILTERED_AGG_SQL)
def sql15_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL15: the FILTER clause on aggregates (shared Spark-4/DuckDB
    dialect) — per-aggregate predicates without CASE-wrapping every
    argument, including the FILTER + DISTINCT combination (a distinct
    agg whose input set is itself predicated). One conditional-
    aggregation pass: Catalyst plans each FILTER as a predicated
    partial agg in the same hash aggregate, so adding a filtered
    column never adds a scan, and the distinct+filter column rewrites
    through the standard expand+two-phase distinct plan. COALESCE on
    the filtered SUM: a group with no 'O' rows yields NULL on both
    engines, pinned to 0 so the contract is explicit."""
    load_tables(spark, sf_dir)
    return spark.sql(_FILTERED_AGG_SQL)
