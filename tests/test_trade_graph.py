"""Focused tests for the round-10 graph-family optimization:
session-cached trade-edge frame + bounded driver solves
(meepo_spark/operators/trade_graph.py). Result-level correctness of the
rewritten queries stays covered by test_oracle's full parity run; these
pin the NEW internals — the cache contract, the boundedness claim the
driver-solve rests on, and the F.round replication the float solves
use."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR
from meepo_spark.operators.trade_graph import (
    round_half_up,
    trade_edges,
    trade_graph_local,
)


def test_trade_graph_local_bounded_and_cached(spark):
    """The collected graph is the bounded-driver-state class: <=625
    edges / <=25 nations at ANY scale factor (|nation|^2 cap), sorted
    deterministically, and the second call is a cache hit (same
    object — no second fact pass)."""
    edges, nations = trade_graph_local(spark, SF_DIR)
    assert len(edges) <= 625 and len(nations) <= 25
    assert edges == sorted(edges)
    assert all(w > 0 for _, _, w in edges)
    again = trade_graph_local(spark, SF_DIR)
    assert again[0] is edges  # session-cache hit, no recompute


def test_trade_edges_matches_collected_graph(spark):
    """The local solve input and the cached Spark frame are the same
    multiset — the collect is a faithful view of the distributed
    reduction."""
    edges, _ = trade_graph_local(spark, SF_DIR)
    frame = sorted(
        (int(r["src"]), int(r["dst"]), int(r["w"]))
        for r in trade_edges(spark, SF_DIR).collect()
    )
    assert frame == edges


def test_round_half_up_matches_spark_round(spark):
    """trade_graph.round_half_up must replicate F.round on DoubleType
    bit-for-bit (shortest-repr decimal + HALF_UP), including the
    dyadic tie cases where python's round() (HALF_EVEN) differs —
    e.g. 1/2048 at 10dp."""
    vals = [
        0.04, 1.0 / 3, 2.0 / 3, 0.0437500000005, 1.0 / 2048, 3.0 / 2048,
        0.1234567890123, 7.5e-7, 1e-9, 0.9999999999995, 123.456789,
        1.0 / 7 + 1e-9, 0.15 / 25,
    ]
    for dp in (6, 10):
        df = spark.createDataFrame([(v,) for v in vals], "v double").select(
            F.round(F.col("v"), dp).alias("r")
        )
        got = [r["r"] for r in df.collect()]
        want = [round_half_up(v, dp) for v in vals]
        assert got == want, (dp, list(zip(vals, got, want)))
