"""Scale-mechanism tests (SURVEY.md §4.4): skew salting and bucketed
co-located joins — the two shuffle-shaping tools the 100 TB posture
relies on beyond AQE."""

from __future__ import annotations

import pyspark.sql.functions as F

from meepo_spark.catalog import table
from meepo_spark.operators.joins import salted_join

from conftest import SF_DIR


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_salted_join_equals_plain_join(spark):
    """Salting must be result-transparent: same rows as the plain
    join on a deliberately skewed input (90% of fact rows on one
    key)."""
    skewed = (
        table(spark, SF_DIR, "lineitem")
        .withColumn(
            "k", F.when(F.col("l_linenumber") > 1, F.lit(0)).otherwise(F.col("l_orderkey"))
        )
        .select("k", "l_quantity")
    )
    dim = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    plain = skewed.join(dim, "k").groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("sv")
    )
    salted = salted_join(skewed, dim, "k").groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("sv")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    """Left-salted rows with no dim match must survive exactly once."""
    big = spark.range(0, 1000).select((F.col("id") % 10).alias("k"), "id")
    dim = spark.range(0, 5).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    plain = big.join(dim, "k", "left")
    salted = salted_join(big, dim, "k", how="left")
    assert plain.count() == salted.count() == 1000
    assert salted.filter(F.col("v").isNull()).count() == 500


def test_bucketed_join_has_no_shuffle(spark):
    """Bucketed tables co-locate join keys at WRITE time; a fact-fact
    join on the bucket key — and even the following agg on that key —
    must then plan with ZERO Exchange nodes. At 100 TB this converts
    the recurring fact-fact shuffle into a one-time layout cost.
    Auto-broadcast is disabled so the test exercises the sort-merge
    path (a broadcast would trivially avoid the shuffle)."""
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("li_bucketed", "o_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    lineitem = table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    orders = table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(
        "li_bucketed"
    )
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(
        "o_bucketed"
    )
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table("li_bucketed")
            .join(
                spark.table("o_bucketed"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        plan = plan_of(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert "SelectedBucketsCount" in plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        for t in ("li_bucketed", "o_bucketed"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
