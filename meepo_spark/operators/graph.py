"""Iterative graph operators: connected components by min-label
propagation (SURVEY.md §4.3#2 — the dedup-cluster 'hard part').

DataFrame iteration needs two disciplines at scale, both applied here:
``localCheckpoint`` every iteration to cut lineage (otherwise the plan
doubles per round and the driver OOMs planning it), and a convergence
action per round (an O(|nodes|) count, which also materializes the
checkpoint). Rounds needed = graph diameter; near-dup clusters are
shallow (a handful of rounds) while the per-round cost is one
join + one aggregate shuffle, each keyed on node id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    local_threshold: int = 2_000_000,
) -> DataFrame:
    """(id, component) for every node in ``edges``; ``component`` is
    the minimum node id reachable from ``id``.

    Size-adaptive, the way production CC runs: the edge list is
    materialized once (localCheckpoint) and counted. A near-dup graph
    is orders of magnitude smaller than the corpus that produced it
    (LSH + verify already discarded non-duplicates — 256 edges from
    5,000 docs at sf0.1), so when it fits in one task
    (≤ ``local_threshold`` edges) the whole graph contracts to a
    single ``applyInPandas`` union-find: one shuffle, zero iteration,
    exact same labeling. Above the threshold — a graph too large for
    one executor's memory — it falls back to iterative min-label
    propagation, whose cost is rounds × (join + agg shuffle) and
    whose state never leaves the cluster. The count that picks the
    path is O(1) on the already-materialized edges.

    The iterative path raises if ``max_iter`` rounds don't converge
    (diameter > max_iter means the input is not a near-dup-style
    shallow graph and needs alternating large/small star instead)."""
    edges = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint()
    if edges.count() <= local_threshold:
        return _local_union_find(edges)
    sym = edges.union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint()  # edges reused every round — never recompute upstream
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    # labels are monotone non-increasing, so the label sum strictly
    # decreases until fixpoint: convergence = unchanged sum, one cheap
    # aggregate per round instead of an old-vs-new join
    prev_sum = labels.agg(F.sum("component")).first()[0]
    for _ in range(max_iter):
        neigh_min = (
            sym.join(labels, sym["b"] == labels["id"])
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
        )
        labels = (
            labels.join(neigh_min, labels["id"] == neigh_min["a"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint()  # cut lineage; materialized by the agg below
        )
        new_sum = labels.agg(F.sum("component")).first()[0]
        if new_sum == prev_sum:
            return labels
        prev_sum = new_sum
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def _local_union_find(edges: DataFrame) -> DataFrame:
    """Contract a one-task-sized edge list to components with
    path-compressed union-find inside a single ``applyInPandas``
    group. Output matches the iterative path bit-for-bit: every
    endpoint labeled with the minimum reachable node id."""
    import pandas as pd

    def uf(pdf: pd.DataFrame) -> pd.DataFrame:
        parent: dict = {}

        def find(x):
            root = x
            while parent.setdefault(root, root) != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for a, b in zip(pdf["a"], pdf["b"]):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra
        roots: dict = {}
        for node in parent:
            r = find(node)
            roots[r] = min(roots.get(r, node), node)
        return pd.DataFrame(
            {"id": list(parent), "component": [roots[find(n)] for n in parent]}
        )

    return edges.groupBy(F.lit(1).alias("_g")).applyInPandas(
        uf, "id long, component long"
    )


def component_sizes(components: DataFrame) -> DataFrame:
    """(component, n_members) — one row per cluster."""
    return components.groupBy("component").agg(F.count(F.lit(1)).alias("n_members"))
