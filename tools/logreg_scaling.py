"""Gradient-descent logistic-regression scaling probe (SCALE.md §20).

Replays the sf0.1 embeddings corpus at 1/4/16/64x volume (row-id
shifted replicas — the gradient is a mean, so replication leaves the
TRAINED WEIGHTS bit-identical, which the probe asserts as its own
correctness gate) and times a 5-round logreg_fit at each multiple,
plus a 20-round run at 1x. Isolates three claims:

1. per-round cost is ONE map-side-combined aggregate over the
   checkpointed feature frame — wall grows sublinearly until the
   frame outsizes the scan overhead, then linearly with rows, never
   with rounds²;
2. round count scales FLAT per round (no lineage growth): the
   20-round per-round wall matches the 5-round per-round wall,
   because weights re-enter each round as fresh literals over the
   same materialized frame (plan size is constant in t);
3. driver state stays O(d): the collected row per round is d+2
   doubles regardless of corpus size.

Usage: python tools/logreg_scaling.py [sf_dir] [max_mult]
Prints one JSON line per configuration: rows, iters, wall seconds,
secs_per_round, and weights_match (vs the 1x run).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from meepo_spark.operators.optim import logreg_fit
from meepo_spark.session import get_spark

_D = 8


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    max_mult = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("logreg-scaling")
    base = (
        spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        .select(
            "vec_id",
            (F.col("label") >= 5).cast("int").alias("y"),
            *[
                F.col("embedding").getItem(i).alias(f"f{i + 1}")
                for i in range(_D)
            ],
        )
    )
    n_base = base.count()
    feats = [f"f{i + 1}" for i in range(_D)]

    ref_w = None
    mult = 1
    while mult <= max_mult:
        # one crossJoin replicator (constant plan size at any mult);
        # ids need not be distinct — the mean gradient only sees the
        # feature/label values, which replication preserves exactly
        df = (
            base.crossJoin(spark.range(mult).select(F.col("id").alias("__rep")))
            .select("y", *feats)
            .repartition(32)
            .localCheckpoint()  # materialize OUTSIDE the timer
        )
        t0 = time.time()
        w, hist, metrics = logreg_fit(df, feats, "y", lr=1.0, iters=5)
        wall = time.time() - t0
        if ref_w is None:
            ref_w = w
        print(
            json.dumps(
                {
                    "mult": mult,
                    "rows": n_base * mult,
                    "iters": 5,
                    "wall_s": round(wall, 2),
                    "secs_per_round": round(wall / 5, 3),
                    # mean gradient is replication-invariant: weights
                    # must match the 1x run to float64 noise
                    "weights_match_1x": all(
                        abs(a - b) < 1e-9 for a, b in zip(w, ref_w)
                    ),
                }
            )
        )
        mult *= 4

    # round-count flatness at 1x: 20 rounds vs 5
    df1 = base.repartition(32).localCheckpoint()
    t0 = time.time()
    logreg_fit(df1, feats, "y", lr=1.0, iters=20)
    wall20 = time.time() - t0
    print(
        json.dumps(
            {
                "mult": 1,
                "rows": n_base,
                "iters": 20,
                "wall_s": round(wall20, 2),
                "secs_per_round": round(wall20 / 20, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
