"""Z-order layout probe — measures what the Morton clustering
actually buys on a multi-dimensional range predicate, vs the two
layouts a team would otherwise ship: natural (insertion) order and a
lexicographic sort on one leading column.

For each layout of the sf lineitem fact (l_partkey × l_suppkey as the
clustered pair), runs the same two-sided range predicate and records:

* rows EMITTED by the scan (executed-plan numOutputRows) — Spark's
  parquet reader prunes at ROW-GROUP grain via footer min/max stats,
  so surviving-row-group rows is the honest pruning metric (numFiles
  stays constant for an unpartitioned dir: every footer is still
  read; it is reported anyway for completeness);
* wall seconds for a count over the pruned scan;
* the one-off layout write cost.

Expected shape (and what SCALE.md records): natural order prunes
nothing (every row group spans the whole key space), lexicographic
prunes ONLY when the leading column is predicated, z-order prunes on
BOTH dimensions at once — the property that makes it the default
layout for a 100 TB fact queried along several axes.

Usage: python tools/zorder_probe.py [sf_dir] [n_files]
Prints one JSON line per (layout, predicate).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from meepo_spark.catalog import table
from meepo_spark.operators.zorder import zorder_write
from meepo_spark.session import get_spark


from meepo_spark.plan_metrics import scan_metric_sum as _scan_metrics


def main(sf_dir: str, n_files: int) -> int:
    spark = get_spark()
    root = tempfile.mkdtemp(prefix="zprobe_")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    pmax = li.agg(F.max("l_partkey"), F.max("l_suppkey")).first()
    # a ~6%-per-dimension box: selective on both axes
    p_hi, s_hi = int(pmax[0] * 0.06), int(pmax[1] * 0.06)
    try:
        layouts = {}
        t0 = time.time()
        li.repartition(n_files).write.mode("overwrite").parquet(
            os.path.join(root, "natural")
        )
        layouts["natural"] = time.time() - t0
        t0 = time.time()
        (
            li.repartitionByRange(n_files, "l_partkey")
            .sortWithinPartitions("l_partkey")
            .write.mode("overwrite")
            .parquet(os.path.join(root, "lex_partkey"))
        )
        layouts["lex_partkey"] = time.time() - t0
        t0 = time.time()
        zorder_write(
            li,
            os.path.join(root, "zorder"),
            ["l_partkey", "l_suppkey"],
            n_files=n_files,
        )
        layouts["zorder"] = time.time() - t0

        preds = {
            "both_dims": (F.col("l_partkey") <= p_hi)
            & (F.col("l_suppkey") <= s_hi),
            "suppkey_only": F.col("l_suppkey") <= s_hi,
        }
        for layout, write_s in layouts.items():
            df = spark.read.parquet(os.path.join(root, layout))
            for pname, pred in preds.items():
                t0 = time.time()
                m = _scan_metrics(df.filter(pred).groupBy().count())
                wall = time.time() - t0
                print(
                    json.dumps(
                        {
                            "probe": "zorder_pruning",
                            "layout": layout,
                            "predicate": pname,
                            "files_read": m.get("numFiles"),
                            "scan_rows": m.get("numOutputRows"),
                            "wall_s": round(wall, 3),
                            "layout_write_s": round(write_s, 2),
                        }
                    ),
                    flush=True,
                )
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    sys.exit(main(sf, n))
