"""BPE training scale probe (round 6): prove l46's headline claim —
after round 0 compresses the corpus to the word-count table, the
per-merge-round cost is VOCABULARY-bound, not corpus-bound.

Method: replicate the sf documents corpus 1x/4x/16x WITHOUT token
mangling (plain replication: token volume grows, the vocabulary does
not — the web-scale regime, where token counts outgrow vocabulary by
orders of magnitude). Measure:

  * t_wordcount — round 0: explode + (word) hash aggregate over the
    full corpus (expected ~linear in the replication);
  * t_rounds    — k=3 merge rounds of bpe_merge_table over the
    CHECKPOINTED word-count frame (expected FLAT: every round touches
    O(vocab x word-length) symbols regardless of corpus size).

Usage: python tools/bpe_scaling.py [sf_dir] — prints one JSON line per
replication plus a summary line with the two growth ratios.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from meepo_spark.operators.bpe import bpe_merge_table
from meepo_spark.session import get_spark


def plain_replicas(spark, sf_dir: str, mult: int):
    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    parts = [
        base.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"), "text"
        )
        for i in range(mult)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bpe-scaling")
    # warm the JVM/codegen on the smallest shape so point 1 isn't
    # inflated by one-time cost (the r1 bench discipline)
    plain_replicas(spark, sf_dir, 1).select(
        F.explode(F.split(F.lower("text"), " ")).alias("word")
    ).groupBy("word").agg(F.count(F.lit(1))).count()
    rows = []
    for mult in (1, 8, 32):
        docs = plain_replicas(spark, sf_dir, mult)
        t0 = time.perf_counter()
        words = (
            docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("wc"))
            .localCheckpoint()  # round 0's output, materialized
        )
        vocab = words.count()
        t_wordcount = time.perf_counter() - t0

        t0 = time.perf_counter()
        mt = bpe_merge_table(words, 3)
        n_merges = mt.count()
        t_rounds = time.perf_counter() - t0
        row = {
            "mult": mult,
            "vocab": vocab,
            "n_merges": n_merges,
            "wordcount_s": round(t_wordcount, 2),
            "rounds_s": round(t_rounds, 2),
        }
        rows.append(row)
        print(json.dumps(row))
    print(
        json.dumps(
            {
                "wordcount_growth_32x": round(
                    rows[-1]["wordcount_s"] / rows[0]["wordcount_s"], 2
                ),
                "rounds_growth_32x": round(
                    rows[-1]["rounds_s"] / rows[0]["rounds_s"], 2
                ),
                "claim": "round 0 ~linear in corpus; merge rounds flat "
                "(vocab-bound)",
            }
        )
    )


if __name__ == "__main__":
    main()
