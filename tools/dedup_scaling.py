"""Near-dup pipeline scaling probe (SCALE.md §4).

Replays the sf0.1 documents corpus at 1/2/4/8x volume and runs the
full MinHash(96) -> LSH(48x2) -> exact-verify pipeline at each
multiple. Every token is suffixed with its replica id, so shingle
spaces are DISJOINT across replicas: the near-dup structure (and
therefore the candidate/verify workload) scales exactly linearly with
input, and the wall-clock curve isolates the pipeline's input scaling
from output growth. (Naive replication without the suffix makes every
replica a near-dup of its siblings — the pair count then grows
quadratically in the multiple, which measures verify-stage load, not
scan scaling.)

Usage: python tools/dedup_scaling.py [sf_dir] [max_mult]
Prints one JSON line per multiple: docs, pairs, wall seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from meepo_spark.operators.dedup import minhash_near_dup_pairs
from meepo_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    max_mult = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("dedup-scaling")
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
        out = minhash_near_dup_pairs(
            d, "text", "doc_id",
            threshold=0.6, shingle_k=3, num_hashes=96, bands=48,
        )
        n = out.count()
        return n, time.time() - t0

    run(1)  # warm the codegen path once so multiples are comparable
    mult = 1
    while mult <= max_mult:
        pairs, wall = run(mult)
        print(json.dumps({
            "mult": mult, "docs": n_base * mult,
            "pairs": pairs, "wall_s": round(wall, 2),
        }))
        mult *= 2


if __name__ == "__main__":
    main()
