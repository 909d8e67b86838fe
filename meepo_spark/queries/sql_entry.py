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
