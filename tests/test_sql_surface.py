"""SQL-entry surface beyond query shapes: parameterized queries and
SQL-defined scalar functions — the API pieces that make the `spark.sql`
entry safe (no string interpolation) and extensible (logic shared in
the catalog rather than re-implemented per caller)."""

from __future__ import annotations

import pyspark.sql.functions as F

from conftest import SF_DIR
from meepo_spark.catalog import load_tables


def test_parameterized_sql_binds_named_args(spark):
    """Named-parameter binding (`:k`) — the injection-safe way to
    template the SQL entry; the literal lands in the plan as a value,
    never via string concatenation."""
    load_tables(spark, SF_DIR)
    got = spark.sql(
        "SELECT n_name FROM nation WHERE n_nationkey < :k ORDER BY n_name",
        args={"k": 3},
    ).collect()
    want = spark.sql(
        "SELECT n_name FROM nation WHERE n_nationkey < 3 ORDER BY n_name"
    ).collect()
    assert [r[0] for r in got] == [r[0] for r in want] and len(got) == 3


def test_sql_defined_scalar_function(spark):
    """CREATE TEMPORARY FUNCTION ... RETURN <expr> (SQL UDF): shared
    scalar logic that stays a Catalyst expression — inlined into the
    caller's plan and codegen'd, unlike a Python UDF there is no
    serialization boundary at all."""
    load_tables(spark, SF_DIR)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION net_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    try:
        got = spark.sql(
            """SELECT l_returnflag,
                      ROUND(SUM(net_price(l_extendedprice, l_discount)), 2) AS rev
               FROM lineitem GROUP BY 1 ORDER BY 1"""
        ).collect()
        want = (
            spark.table("lineitem")
            .groupBy("l_returnflag")
            .agg(
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                ).alias("rev")
            )
            .orderBy("l_returnflag")
            .collect()
        )
        assert [tuple(r) for r in got] == [tuple(r) for r in want]
        # the SQL UDF is inlined: no Python evaluation node in the plan
        plan = (
            spark.sql("SELECT net_price(l_extendedprice, l_discount) FROM lineitem")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "EvalPython" not in plan
    finally:
        spark.sql("DROP TEMPORARY FUNCTION IF EXISTS net_price")


def test_map_in_arrow_batch_transform(spark):
    """mapInArrow — the lowest-overhead Python boundary: raw Arrow
    RecordBatches in and out, no pandas conversion at all. The right
    lane when the kernel already speaks Arrow (tokenizers, image
    codecs); completes the UDF surface next to pandas_udf (U1),
    applyInPandas (U2), and UDTF (U4)."""
    import pyarrow as pa

    from meepo_spark.catalog import table

    nation = table(spark, SF_DIR, "nation")

    def upper_names(batches):
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            yield pa.RecordBatch.from_arrays(
                [
                    tbl.column("n_nationkey").combine_chunks(),
                    pa.compute.utf8_upper(
                        tbl.column("n_name").combine_chunks()
                    ),
                ],
                names=["n_nationkey", "n_name_uc"],
            )

    got = {
        r["n_nationkey"]: r["n_name_uc"]
        for r in nation.mapInArrow(
            upper_names, "n_nationkey int, n_name_uc string"
        ).collect()
    }
    want = {
        r["n_nationkey"]: r["n_name"].upper() for r in nation.collect()
    }
    assert got == want
