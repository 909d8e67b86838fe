"""Event-store clustered-compaction probe (VERDICT r9 task 6) —
measures what `compact_txn_clustered`'s Morton layout buys the two
hot replay access patterns, against the honest control: the SAME
latest-image snapshot with the SAME columns (pk_num included) and the
SAME file count, written without clustering (coalesce order — what a
plain OPTIMIZE file-size pass produces).

For each layout and each replay predicate —
  * table equality   ("rebuild table X"),
  * pk_num range     ("replay a key range"),
  * both combined    (the A8-style scoped rebuild)
— records rows EMITTED by the parquet scan (executed-plan
numOutputRows: Spark prunes at row-group grain via footer min/max, so
surviving-row-group rows is the honest pruning metric) plus the wall
of a count over the pruned scan, and the one-off layout write cost.

Expected shape (what SCALE.md §24 records): the plain snapshot emits
~everything for every predicate (each file spans the whole key
space); the clustered snapshot emits a small fraction for EITHER
predicate alone and less for both — the property that lets a 100 TB
store serve table rebuilds and key-scoped replays without scanning
the lake.

Usage: python tools/eventstore_layout_probe.py [sf_dir] [target_kb]
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

from meepo_spark.plan_metrics import scan_metric_sum as _scan_metrics
from meepo_spark.session import get_spark


def main(sf_dir: str, target_kb: int) -> int:
    from meepo_spark.cdc.event_store import TypedTransactionalEventStore
    from meepo_spark.cdc.events import events_as_changes

    spark = get_spark()
    root = tempfile.mkdtemp(prefix="esprobe_")
    try:
        tbl = (
            F.when(F.col("row")["last_event_type"] == "signup", F.lit("users"))
            .when(F.col("row")["last_event_type"] == "purchase", F.lit("orders"))
            .otherwise(F.lit("activity"))
        )
        ch = events_as_changes(spark, sf_dir).withColumn(
            "table",
            F.when(F.col("action") == "delete", F.lit("activity")).otherwise(tbl),
        )
        store = TypedTransactionalEventStore(spark, os.path.join(root, "store"))
        for i in range(3):
            store.append_epoch(ch.filter(F.col("offset") % 3 == i), i)

        t0 = time.time()
        snap_dir, n_files = store.compact_txn_clustered(
            target_bytes=target_kb * 1024
        )
        z_write = time.time() - t0

        # control: same rows/columns/file count, round-robin placement
        # (coalesce would INHERIT the clustered order — no control at
        # all; repartition's exchange destroys it, like a compaction
        # that only chased file sizes)
        plain_dir = os.path.join(root, "plain")
        t0 = time.time()
        (
            spark.read.parquet(snap_dir)
            .repartition(n_files)
            .write.mode("overwrite")
            .parquet(plain_dir)
        )
        p_write = time.time() - t0

        full = spark.read.parquet(snap_dir)
        lo, hi = full.agg(F.min("pk_num"), F.max("pk_num")).first()
        span = max(hi - lo, 1)
        preds = {
            "table_eq": F.col("table") == "orders",
            "pk_range": F.col("pk_num").between(lo, lo + span // 10),
            "both": (F.col("table") == "orders")
            & F.col("pk_num").between(lo, lo + span // 10),
        }
        total = full.count()
        for layout, d, wcost in (
            ("plain", plain_dir, p_write),
            ("zorder", snap_dir, z_write),
        ):
            for pname, pred in preds.items():
                q = spark.read.parquet(d).filter(pred)
                t0 = time.time()
                matched = q.count()
                wall = time.time() - t0
                emitted = _scan_metrics(q, ("numOutputRows",)).get(
                    "numOutputRows", 0
                )
                print(
                    json.dumps(
                        {
                            "layout": layout,
                            "predicate": pname,
                            "files": n_files,
                            "rows_total": total,
                            "rows_matched": matched,
                            "rows_emitted_by_scan": emitted,
                            "emit_frac": round(emitted / max(total, 1), 4),
                            "count_sec": round(wall, 3),
                            "write_sec": round(wcost, 2),
                        }
                    )
                )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    kb = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    raise SystemExit(main(sf, kb))
