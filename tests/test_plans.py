"""Plan-assertion tests (SURVEY.md §5.2.6): cheap regression net over
the Catalyst behaviors the 100 TB design depends on (§4.2). Each test
asserts a substring of ``explain``-formatted physical plans — if a
future refactor silently breaks pushdown / broadcast / partial agg,
these fail long before a benchmark would show it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meepo_spark.catalog import table
from meepo_spark.registry import QUERIES, load_all

load_all()

from conftest import SF_DIR


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_p3_filter_and_projection_reach_parquet_scan(spark):
    """P3: a 2-column projection + filter must prune at the scan, not
    after it — at 100 TB reading all 16 lineitem columns is the
    difference between scanning 100 TB and ~10 TB."""
    df = (
        table(spark, SF_DIR, "lineitem")
        .filter(F.col("l_quantity") < 5)
        .select("l_orderkey", "l_quantity")
    )
    plan = plan_of(df)
    assert "PushedFilters" in plan and "LessThan(l_quantity" in plan
    read_schema = next(ln for ln in plan.splitlines() if "ReadSchema" in ln)
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_comment" not in read_schema  # widest column stays unread


def test_j1_dimension_join_broadcasts(spark):
    """J1: region/nation-sized dims must broadcast — a shuffle join
    against a 5-row table would shuffle the 100 TB fact side."""
    plan = plan_of(QUERIES["j1_inner_broadcast"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_g5_partial_then_final_aggregation(spark):
    """G5: groupBy must map-side combine (partial_) before the
    shuffle, so the shuffle moves |groups| rows, not |input| rows."""
    df = (
        table(spark, SF_DIR, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("sum_qty"))
    )
    plan = plan_of(df)
    assert "partial_sum" in plan
    assert plan.count("HashAggregate") >= 2


def test_whole_stage_codegen_covers_scan_filter_agg(spark):
    """The hot path (scan→filter→agg) must stay inside whole-stage
    codegen: JVM-compiled loops, no per-row interpretation."""
    df = (
        table(spark, SF_DIR, "lineitem")
        .filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
    )
    # AQE shows codegen subtrees only in codegen-mode explain
    codegen = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "codegen"
    )
    assert "WholeStageCodegen" in codegen
    assert "Found" in codegen  # "Found N WholeStageCodegen subtrees"


def test_q1_flagship_plan_shape(spark):
    """Flagship Q1: one scan, pushed filter, two-phase agg, no join,
    no Python (BatchEvalPython would mean a row-at-a-time UDF crept
    into the hot path)."""
    plan = plan_of(QUERIES["q1_pricing_summary"](spark, SF_DIR))
    assert "PushedFilters" in plan
    assert "partial_" in plan
    assert "BatchEvalPython" not in plan


def test_j7_asof_join_partitions_not_cross_join(spark):
    """J7: the as-of join must be a key-partitioned window dedup, not
    a nested-loop cross product (which would be |left|×|right|)."""
    plan = plan_of(QUERIES["j7_asof_join"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_aqe_enabled(spark):
    """AQE must stay on — it is the runtime re-planner the §4.4 skew
    and shuffle-sizing posture relies on."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


@pytest.mark.parametrize("name", ["l3_cosine_topk", "l2_minhash_lsh_pairs"])
def test_llm_kernels_use_arrow_not_row_python(spark, name):
    """U1 discipline: any Python in LLM kernels must be Arrow-batched
    (ArrowEvalPython / FlatMapGroupsInPandas), never row-at-a-time
    BatchEvalPython."""
    plan = plan_of(QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan
