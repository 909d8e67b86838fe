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


def test_pipe_syntax_plan_matches_classic_sql(spark, sf_dir):
    """sql13's claim: `|>` stages are pure surface syntax — the
    optimized plan must be identical to the classic-SQL twin (same
    pushed filter, same aggregate, same HAVING filter)."""
    from meepo_spark.catalog import load_tables

    load_tables(spark, sf_dir)
    piped = spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate <= DATE '1998-09-02'
        |> AGGREGATE COUNT(*) AS n_rows,
                     ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                         AS revenue
           GROUP BY l_returnflag, l_linestatus
        |> WHERE n_rows > 100
        """
    )
    classic = spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        HAVING COUNT(*) > 100
        """
    )
    p1 = piped._jdf.queryExecution().optimizedPlan().toString()
    p2 = classic._jdf.queryExecution().optimizedPlan().toString()
    # plan ids differ run to run; strip them before comparing shape
    import re

    strip = lambda s: re.sub(r"#\d+L?", "#x", s)
    assert strip(p1) == strip(p2)
    # the graded sql13 form adds an EXTEND stage: the staged expression
    # moves into a pre-aggregate Project (computed once per row, same
    # physical work) — assert its plan still pushes the scan filter and
    # keeps the post-AGGREGATE WHERE as a post-aggregate filter
    extended = spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate <= DATE '1998-09-02'
        |> EXTEND l_extendedprice * (1 - l_discount) AS disc_price
        |> AGGREGATE COUNT(*) AS n_rows, ROUND(SUM(disc_price), 2) AS revenue
           GROUP BY l_returnflag, l_linestatus
        |> WHERE n_rows > 100
        """
    )
    pe = extended._jdf.queryExecution().optimizedPlan().toString()
    phys = extended._jdf.queryExecution().executedPlan().toString()
    assert "LessThanOrEqual(l_shipdate" in phys.split("PushedFilters: [")[1]
    assert pe.index("Filter (n_rows") < pe.index("Aggregate")


def test_polymorphic_udtf_rejects_non_constant_width(spark, sf_dir):
    """u11's analyze must fail loud when the width argument is not a
    foldable constant — the schema can't depend on row values."""
    import pytest
    from pyspark.errors import AnalysisException

    from meepo_spark.catalog import table
    from meepo_spark.queries.udf_surface import _unpack_dims

    spark.udtf.register("unpack_dims_t", _unpack_dims())
    table(spark, sf_dir, "embeddings").filter("vec_id < 5").select(
        "vec_id", "embedding"
    ).createOrReplaceTempView("u11_test_vecs")
    with pytest.raises(AnalysisException, match="constant integer"):
        spark.sql(
            "SELECT s.* FROM u11_test_vecs v, LATERAL "
            "unpack_dims_t(embedding, CAST(vec_id AS INT)) s"
        ).collect()


def test_polymorphic_udtf_width_drives_schema(spark, sf_dir):
    """The same registered function yields different schemas for
    different constant widths — the polymorphism u11 exists to grade."""
    from meepo_spark.catalog import table
    from meepo_spark.queries.udf_surface import _unpack_dims

    spark.udtf.register("unpack_dims_t2", _unpack_dims())
    table(spark, sf_dir, "embeddings").filter("vec_id < 3").select(
        "vec_id", "embedding"
    ).createOrReplaceTempView("u11_test_vecs2")
    for n in (2, 6):
        out = spark.sql(
            f"SELECT s.* FROM u11_test_vecs2 v, LATERAL "
            f"unpack_dims_t2(embedding, {n}) s"
        )
        assert out.columns == [f"d{i}" for i in range(n)]
        assert out.count() == 3
