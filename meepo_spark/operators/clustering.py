"""Distributed Lloyd k-means on DataFrames — the iterative-ML shape
(assign / re-estimate / repeat) done engine-side, complementing the
driver-side sampled quantizer in ``similarity._kmeans_centroids``.

Design for 100 TB:
  * assignment is one Arrow-batched matmul per partition batch
    (numpy ``X @ C.T``), returning (cluster, sq-distance) together —
    never a per-row Python loop and never a |rows| × k crossJoin;
  * the M-step is elementwise: posexplode → per-(cluster, dim) AVG →
    rebuild vectors — two narrow shuffles of |rows|·dim and k·dim
    rows, both partial-aggregated map-side;
  * centroids live in a plain Python list (k × dim floats) broadcast
    into the next UDF — driver state is O(k·dim) regardless of
    corpus size;
  * every round's assignment frame is ``localCheckpoint``-ed so
    lineage stays O(1) across iterations (same discipline as
    ``operators/graph.py``'s connected components).

Determinism: init picks the k lowest-id vectors; all arithmetic is
float64; argmin ties resolve to the lowest cluster id — repeated
runs produce identical assignments, which the property tests rely on.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _assign_udf(centroids: list[list[float]]):
    """vector → (nearest cluster id, squared distance to it)."""
    c = np.asarray(centroids, dtype="float64")  # (k, dim)
    ct = c.T.copy()
    c_sq = (c * c).sum(axis=1)

    @pandas_udf("cluster int, sqdist double")
    def nearest(vs: pd.Series) -> pd.DataFrame:
        x = np.asarray(vs.tolist(), dtype="float64")  # (batch, dim)
        d = x @ ct  # (batch, k)
        # full squared distance so inertia falls out of the same pass
        dist = (x * x).sum(axis=1, keepdims=True) - 2.0 * d + c_sq
        best = dist.argmin(axis=1)
        return pd.DataFrame(
            {
                "cluster": best.astype("int32"),
                "sqdist": dist[np.arange(len(best)), best],
            }
        )

    return nearest


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 5,
) -> tuple[DataFrame, list[list[float]], list[float]]:
    """Fit k-means; returns (assignments, centroids, inertia-per-iter).

    ``assignments`` is (id, cluster) under the FINAL centroids;
    ``inertia[t]`` is Σ sq-distance after iteration t's update and
    reassignment — Lloyd guarantees the sequence is non-increasing,
    which the property test asserts."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).localCheckpoint()

    cent = [r["v"] for r in base.orderBy("id").limit(k).collect()]
    if len(cent) < k:
        raise ValueError(
            f"kmeans_fit: need >= {k} rows to seed {k} centroids, got {len(cent)}"
        )

    def e_step(c):
        a = base.withColumn("a", _assign_udf(c)(F.col("v"))).select(
            "id", "v", F.col("a.cluster").alias("cluster"), F.col("a.sqdist").alias("sqdist")
        )
        return a.localCheckpoint()

    assigned = e_step(cent)
    inertia_hist: list[float] = []
    for _ in range(iters):
        # M-step: elementwise means per cluster
        means = (
            assigned.select("cluster", F.posexplode("v").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("cluster")
            .agg(F.sort_array(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select("cluster", F.col("dm.m").alias("centroid"))
        )
        got = {r["cluster"]: list(r["centroid"]) for r in means.collect()}
        # empty clusters keep their previous centroid (standard Lloyd)
        cent = [got.get(c, cent[c]) for c in range(k)]
        assigned = e_step(cent)
        inertia_hist.append(
            float(assigned.agg(F.sum("sqdist")).first()[0])
        )
    return assigned.select("id", "cluster"), cent, inertia_hist
