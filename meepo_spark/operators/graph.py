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
) -> DataFrame:
    """(id, component) for every node in ``edges``; ``component`` is
    the minimum node id reachable from ``id`` — min-label propagation
    run to fixpoint. Raises if ``max_iter`` rounds don't converge
    (diameter > max_iter means the input is not a near-dup-style
    shallow graph and needs a different algorithm, e.g. alternating
    large/small star)."""
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
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


def component_sizes(components: DataFrame) -> DataFrame:
    """(component, n_members) — one row per cluster."""
    return components.groupBy("component").agg(F.count(F.lit(1)).alias("n_members"))
