"""Session-scoped nation trade graph (optimization round 10).

Every member of the iterative-graph family (g10 PageRank, g28
primary-edge hops, g29 label propagation, g30 k-core, g31
assortativity, g32 BFS, g33 harmonic centrality) opened with the SAME
fact reduction: lineitem ⋈ orders ⋈ broadcast(customer-key) ⋈
broadcast(supplier-key) → groupBy(src, dst) count — six copies of one
100 TB pass per bench session. The aggregated graph is bounded by
|nation|² = 625 rows at ANY scale factor, so the reduction is computed
ONCE per (app, sf_dir) here (the doc_cache/sparse_tf discipline) and
every family member derives its variant (distinct edges, primary
argmax edge, symmetrized undirected list) from the cached frame.

The second half of the family's cost was the ITERATION TAIL: 4–8
rounds of join + aggregate + localCheckpoint over a ≤625-row frame —
30–50 scheduled jobs/stages of pure latency per query, independent of
data size (guide §1.2: fix the distributed algorithm first; §5: the
driver should do almost no data work — and a 25-node solve is no
data). The round-10 posture is the `operators/quantiles.py` two-phase
shape: the fact reduction IS distributed (and is the only stage that
scales with corpus size); the bounded-state solve runs as exact
driver arithmetic over the collected ≤625 edges, and only the final
≤25-row result re-enters Spark as a local relation. `collect()` here
is the k-means-centroid/BPE-merge-table class: SF-independent bounded
state, never fact rows.

Float discipline for driver solves matches the engines': Spark's
``F.round(double, n)`` is java BigDecimal.valueOf(double) (shortest
decimal repr) + HALF_UP — replicated exactly by ``round_half_up``
below (python ``repr`` is the same shortest roundtrip repr).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meepo_spark.catalog import table
from meepo_spark.operators.broadcast_gate import maybe_broadcast
from meepo_spark.queries._session_cache import SessionFrameCache

_EDGE_CACHE = SessionFrameCache(max_per_app=3)


def _build_trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")
    cust_key = customer.select("c_custkey", F.col("c_nationkey").alias("src"))
    supp_key = supplier.select("s_suppkey", F.col("s_nationkey").alias("dst"))
    return (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(maybe_broadcast(cust_key), F.col("o_custkey") == F.col("c_custkey"))
        .join(maybe_broadcast(supp_key), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .coalesce(1)  # <=625 rows at ANY scale factor
    )


def trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, w): the directed customer-nation → supplier-nation
    trade edge list with exact long edge counts, self-loops included
    (g10's convention; consumers that exclude them filter). One fact
    pass per (app, sf_dir) serves the whole g-family."""
    return _EDGE_CACHE.get(spark, sf_dir, _build_trade_edges)


# (appId, sf_dir) -> (edges, nations); bounded: <=625 + 25 tuples
_LOCAL: dict[tuple, tuple] = {}


def trade_graph_local(
    spark: SparkSession, sf_dir: str
) -> tuple[list[tuple[int, int, int]], list[tuple[int, str]]]:
    """The collected bounded graph: (edges, nations) with
    edges = [(src, dst, w)…] sorted by (src, dst) and
    nations = [(n_nationkey, n_name)…] sorted by key. Deterministic
    order so every driver solve folds in a fixed sequence."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _LOCAL.get(key)
    if hit is not None:
        return hit
    for k in [k for k in _LOCAL if k[0] != key[0]]:
        _LOCAL.pop(k)
    edges = sorted(
        (int(r["src"]), int(r["dst"]), int(r["w"]))
        for r in bounded_rows(trade_edges(spark, sf_dir), 625, "trade edges")
    )
    nations = sorted(
        (int(r["n_nationkey"]), str(r["n_name"]))
        for r in bounded_rows(
            table(spark, sf_dir, "nation").select("n_nationkey", "n_name"),
            25,
            "nations",
        )
    )
    _LOCAL[key] = (edges, nations)
    return edges, nations


def round_half_up(v: float, dp: int) -> float:
    """Exactly Spark's F.round on DoubleType: shortest-repr decimal,
    HALF_UP at ``dp`` places, back to double."""
    return float(Decimal(repr(v)).quantize(Decimal(1).scaleb(-dp), ROUND_HALF_UP))


def bounded_rows(df: DataFrame, cap: int, what: str) -> list:
    """Collect a PROVABLY bounded frame for a driver solve, enforcing
    the bound at runtime: query bodies must not collect directly (the
    test_plans source lint), and this helper is the audited gate — a
    frame that outgrows its documented SF-independent cap fails loudly
    instead of silently becoming a driver OOM at scale."""
    # NOT limit(cap+1).collect(): a global LIMIT executes
    # incrementally (1 partition, then scaleUpFactor-times more per
    # retry — sequential jobs), measured 3× slower than the straight
    # parallel collect on l3l's windowed shortlist. The frames here
    # are bounded by construction; the cap check still catches a
    # drifted bound loudly, just after the collect.
    rows = df.collect()
    if len(rows) > cap:
        raise ValueError(
            f"bounded_rows({what}): {len(rows)} > {cap} rows — the "
            "boundedness claim this driver solve rests on no longer holds"
        )
    return rows
