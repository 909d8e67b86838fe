"""Relational-core scaling probe (SCALE.md §1/§2).

Replays lineitem (and orders for the join case) at 1/2/4/8x volume
with key-shifted replicas and measures two plan archetypes:

  * scan-agg (the q1_pricing_summary shape): projection + filter +
    6-way grouped aggregate — no join, one shuffle of
    |groups| x partials;
  * join-agg (the q3_shipping_priority shape): fact-fact equi-join
    orders x lineitem on the shifted key + grouped aggregate — the
    shuffle-bound archetype.

Key shifting keeps join selectivity and group cardinality identical
per replica, so the wall curve isolates input scaling. Usage:
python tools/relational_scaling.py [sf_dir] [max_mult]; one JSON line
per (archetype, multiple).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from meepo_spark.session import get_spark

SHIFT = 100_000_000


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    max_mult = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("relational-scaling")
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))

    def rep(df, key, i):
        return df.withColumn(key, F.col(key) + F.lit(i * SHIFT))

    def stack(df, key, mult):
        out = df
        for i in range(1, mult):
            out = out.unionAll(rep(df, key, i))
        return out

    def scan_agg(mult):
        d = stack(li, "l_orderkey", mult)
        return (
            d.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity").alias("sq"),
                F.sum("l_extendedprice").alias("sp"),
                F.avg("l_discount").alias("ad"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    def join_agg(mult):
        dl = stack(li, "l_orderkey", mult)
        do = stack(o, "o_orderkey", mult)
        return (
            dl.join(do, dl.l_orderkey == do.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    for name, fn in (("scan_agg", scan_agg), ("join_agg", join_agg)):
        fn(1).write.format("noop").mode("overwrite").save()  # warm codegen
        mult = 1
        while mult <= max_mult:
            t0 = time.time()
            fn(mult).write.format("noop").mode("overwrite").save()
            print(json.dumps({
                "archetype": name, "mult": mult,
                "wall_s": round(time.time() - t0, 2),
            }))
            mult *= 2


if __name__ == "__main__":
    main()
