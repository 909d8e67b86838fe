"""Scaling probe: bucketed enumeration vs the naive global window.

Replicates sf0.1 lineitem Nx with shifted keys and times
``row_number() OVER (ORDER BY ...)`` (all rows through ONE WindowExec
task) against ``operators/enumeration.bucketed_row_number`` (the o7
discipline every r3 window rewrite uses). Unlike the round-2 negative
probes (SCALE.md §7), this one shows a real local[32] gap — the
single-task sort stops hiding once the partition outgrows a few
million rows — and the gap is the LOWER bound of the cluster benefit:
at 1000 executors the naive plan still runs one task while the
bucketed plan spreads across buckets.

Measured 2026-08-14 (local[32], 128 GiB): 19.2M rows (32x) ->
naive 27.3 s, bucketed 9.4 s (2.9x); both verified hash-identical by
tests/test_properties.py::test_bucketed_enumeration_equals_window_functions.
Same session, the TINY-KEY variant (running count partitioned by the
3-value l_returnflag — the e3/g11/v11 class — vs the two-level
per-(key, bucket) + broadcast-offset composition) at 38.4M rows
(64x): naive 46.5 s, two-level 21.9 s (2.1x) — with only 3 keys the
"keyed" window is a near-global sort and the gap again lower-bounds
the cluster benefit.

Usage: python tools/enumeration_scaling.py [sf_dir] [replication]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from meepo_spark.operators.enumeration import bucketed_row_number
from meepo_spark.session import get_spark


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark("enumeration-scaling")
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey", "l_linenumber"
    )
    rep = spark.range(reps).select(F.col("id").alias("r"))
    big = (
        li.crossJoin(rep)
        .select(
            (F.col("l_orderkey") + F.col("r") * 10_000_000).alias("k"),
            "l_linenumber",
        )
        .persist()
    )
    n = big.count()

    t0 = time.perf_counter()
    _force(big.withColumn("rn", F.row_number().over(W.orderBy("k", "l_linenumber"))))
    naive = time.perf_counter() - t0

    t0 = time.perf_counter()
    _force(
        bucketed_row_number(
            big,
            F.floor(F.col("k") / 1_000_000),
            [F.col("k").asc(), F.col("l_linenumber").asc()],
            out="rn",
        )
    )
    bucketed = time.perf_counter() - t0
    print(
        f'{{"mode": "global", "rows": {n}, "naive_s": {naive:.1f},'
        f' "bucketed_s": {bucketed:.1f}, "speedup": {naive / bucketed:.2f}}}'
    )

    # tiny-key variant: running count per 3-value l_returnflag
    li3 = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_returnflag", "l_orderkey", "l_linenumber"
    )
    big3 = (
        li3.crossJoin(rep)
        .select(
            "l_returnflag",
            (F.col("l_orderkey") + F.col("r") * 10_000_000).alias("k"),
            "l_linenumber",
        )
        .persist()
    )
    n3 = big3.count()
    w = (
        W.partitionBy("l_returnflag").orderBy("k", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    t0 = time.perf_counter()
    _force(big3.withColumn("rs", F.count(F.lit(1)).over(w)))
    naive3 = time.perf_counter() - t0
    b = big3.withColumn("__b", F.floor(F.col("k") / 1_000_000))
    counts = b.groupBy("l_returnflag", "__b").agg(F.count(F.lit(1)).alias("n"))
    off_w = (
        W.partitionBy("l_returnflag").orderBy("__b")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offs = counts.select(
        "l_returnflag", "__b",
        F.coalesce(F.sum("n").over(off_w), F.lit(0)).alias("off"),
    )
    in_w = (
        W.partitionBy("l_returnflag", "__b").orderBy("k", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    t0 = time.perf_counter()
    _force(
        b.join(F.broadcast(offs), ["l_returnflag", "__b"]).withColumn(
            "rs", F.count(F.lit(1)).over(in_w) + F.col("off")
        )
    )
    two = time.perf_counter() - t0
    big3.unpersist()
    big.unpersist()
    print(
        f'{{"mode": "tiny_key", "rows": {n3}, "naive_s": {naive3:.1f},'
        f' "two_level_s": {two:.1f}, "speedup": {naive3 / two:.2f}}}'
    )


if __name__ == "__main__":
    main()
