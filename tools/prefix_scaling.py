"""Scaling probe: bucketed_prefix_sum vs the tiny-key cumsum window.

Replicates the exact trap the r4 runtime waiver audit caught in
g11_weighted_median: a per-flag running SUM over the per-DISTINCT-
(flag, cents) weight frame, whose row count grows linearly with the
fact (594k rows at sf0.1 — "distinct values of a continuous price"
is not a bound). The naive window funnels each flag's whole value
grid through one WindowExec task; `bucketed_prefix_sum` (32768-cent
bands: per-band sums, broadcast band offsets, per-band local cumsum)
keeps every window partition ≤ 32768 rows by construction.

As with enumeration_scaling.py, the local[32] gap LOWER-bounds the
cluster benefit: the naive plan runs 3 tasks total no matter the
cluster size; the bucketed plan spreads across flag×band.

Measured 2026-08-14 (local[32], 128 GiB), replicating the sf0.1
per-value frame (3 flag groups): 9.5M rows (16×) -> naive 7.8 s,
bucketed 4.3 s (1.8×); 28.5M rows (48×) -> naive 32.7 s, bucketed
10.6 s (3.1×) — the single-task sorts grow super-linearly once a
flag's partition outspills, the bucketed shape tracks row count.
Equality of the cumulative sums verified in-run on a sample join
(0 mismatches at both scales).

Usage: python tools/prefix_scaling.py [sf_dir] [replication]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from meepo_spark.operators.enumeration import bucketed_prefix_sum
from meepo_spark.session import get_spark


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("prefix-scaling")
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    rep = spark.range(reps).select(F.col("id").alias("r"))
    per_value = (
        li.crossJoin(rep)
        .select(
            "l_returnflag",
            (F.col("cents") + F.col("r") * 20_000_000).alias("cents"),
            "qty",
        )
        .groupBy("l_returnflag", "cents")
        .agg(F.sum("qty").alias("w"))
        .persist()
    )
    n = per_value.count()

    naive_w = (
        W.partitionBy("l_returnflag")
        .orderBy(F.col("cents").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    t0 = time.perf_counter()
    _force(per_value.withColumn("cumw", F.sum("w").over(naive_w)))
    naive = time.perf_counter() - t0

    t0 = time.perf_counter()
    bucketed_df = bucketed_prefix_sum(
        per_value,
        bucket=F.floor(F.col("cents") / 32768),
        order_cols=[F.col("cents").asc()],
        vals={"cumw": "w"},
        part_cols=["l_returnflag"],
    )
    _force(bucketed_df)
    bucketed = time.perf_counter() - t0

    # correctness spot-check: the two cumsums agree on a sample
    sample = per_value.withColumn("cumw", F.sum("w").over(naive_w)).filter(
        F.col("cents") % 9973 == 0
    )
    mism = (
        bucketed_df.filter(F.col("cents") % 9973 == 0)
        .select("l_returnflag", "cents", F.col("cumw").alias("cb"))
        .join(sample, ["l_returnflag", "cents"])
        .filter(F.col("cb") != F.col("cumw"))
        .count()
    )
    print(
        f'{{"rows": {n}, "naive_s": {naive:.1f}, "bucketed_s": {bucketed:.1f},'
        f' "speedup": {naive / bucketed:.2f}, "sample_mismatches": {mism}}}'
    )


if __name__ == "__main__":
    main()
