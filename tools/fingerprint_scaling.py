"""Winnowing-fingerprint pipeline scaling probe (SCALE.md §19).

Replays the sf0.1 documents corpus at 1/2/4/8x volume and runs the
full winnow-fingerprint -> stop-fp cut -> inverted-index pair join
(the l53/l54 pipeline) at each multiple. Like dedup_scaling, every
token is suffixed with its replica id so fingerprint spaces are
DISJOINT across replicas: the dup structure (and therefore pair
workload) scales exactly linearly with input, and the wall-clock
curve isolates two claims —

1. fingerprinting is a flat per-row projection (scan-bound), and
2. the df<=20 stop-fingerprint cut keeps the fp self-join linear:
   candidate pairs grow with the corpus's dup structure (linear under
   disjoint replication), never with the corpus squared. (The
   counterfactual all-pairs join would be mult^2 x the base cost —
   the measured ratio is what makes the inverted index the 100 TB
   path, cf. SCALE.md §4's identical argument for LSH banding.)

Usage: python tools/fingerprint_scaling.py [sf_dir] [max_mult]
Prints one JSON line per multiple: docs, fps, pairs, wall seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from meepo_spark.operators.fingerprint import (
    candidate_pairs,
    explode_fps,
    with_fingerprints,
)
from meepo_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    max_mult = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("fingerprint-scaling")
    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_base = base.count()

    def rep(i: int):
        txt = F.array_join(
            F.transform(
                F.split("text", " "), lambda t: F.concat(t, F.lit(f"_{i}"))
            ),
            " ",
        )
        return base.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            txt.alias("text"),
        )

    def run(mult: int):
        d = rep(0)
        for i in range(1, mult):
            d = d.unionAll(rep(i))
        t0 = time.time()
        # persist the exploded frame so the projection is measured
        # ONCE (fps count + pair join share it), exactly the l53/l54
        # pipeline via the same shared candidate_pairs operator
        e = explode_fps(
            with_fingerprints(
                d.withColumn("toks", F.split(F.lower("text"), " ")).select(
                    "doc_id", "toks"
                ),
                "toks", 5, 4,
            ).select("doc_id", "fps")
        ).persist()
        try:
            n_fps = e.count()
            n_pairs = candidate_pairs(e, max_df=20, min_shared=3).count()
        finally:
            e.unpersist()
        return n_fps, n_pairs, time.time() - t0

    run(1)  # warm the codegen path once so multiples are comparable
    mult = 1
    while mult <= max_mult:
        fps, pairs, wall = run(mult)
        print(json.dumps({
            "mult": mult, "docs": n_base * mult, "fps": fps,
            "pairs": pairs, "wall_s": round(wall, 2),
        }))
        mult *= 2


if __name__ == "__main__":
    main()
