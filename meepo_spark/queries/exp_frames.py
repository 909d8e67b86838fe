"""Shared experiment frames — the ONE definition of the per-user
purchase-revenue-in-cents A/B population (arm = user_id % 2) that
e20 (quantile treatment effect) and v24 (Mann-Whitney U) both grade
over, in BOTH engines: the engine helper below and the oracle CTE
fragment are emitted from this module, so a revenue-definition change
(refund exclusion, cents rounding) can never desync the two queries
or their oracles — the same single-sourcing fix the Holt constants
got in timeseries.py (code-review finding #3 of the round-7
continuation session).

v16/v23 share the CONVERSION population (binary converted flag) —
a different frame with its own inline definition; only the revenue
frame had drifted into four copies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meepo_spark.catalog import table

# DuckDB CTE body: (arm, cents) per user — keep the text in lockstep
# with user_revenue_arms below.
REV_ARMS_SQL = """
        SELECT user_id % 2 AS arm,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN CAST(ROUND(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS cents
        FROM events GROUP BY user_id
"""


def user_revenue_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(arm, cents): per-user total purchase revenue in exact integer
    cents, arm = user_id % 2. One per-user shuffle; non-purchasers
    keep cents = 0 (they are part of the experiment population)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("long"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("cents")
        )
        .select((F.col("user_id") % 2).alias("arm"), "cents")
    )
