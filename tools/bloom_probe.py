"""Parquet bloom-filter point-lookup probe — the row-group skipping
mechanism for HIGH-CARDINALITY, UNSORTED keys, where min/max stats
(and any sort/Z-order layout) are useless because every row group
spans the whole key domain.

Writes the sf lineitem fact twice — plain, and with a parquet bloom
filter on l_orderkey — and measures scan-emitted rows + wall for an
equality lookup of one existing key and one absent key. The absent-
key case is the sharper one: blooms have no false negatives, so a
missing key should skip (almost) every row group.

100 TB reading: point lookups on a fact (order id, txn id, trace id)
are exactly the query a columnar store serves worst; a bloom per row
group turns them from full scans into a handful of false-positive
groups at ~1% storage overhead. This composes with §12's Z-order:
cluster for the range axes, bloom for the needle axes.

Usage: python tools/bloom_probe.py [sf_dir] [n_files]
Prints one JSON line per (layout, lookup).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from meepo_spark.catalog import table
from meepo_spark.plan_metrics import scan_metric_sum
from meepo_spark.session import get_spark


def key_probe(li, key_col: str = "l_orderkey"):
    """(present, in-range absent, ndv) for the lookup column, computed
    off ONE cached distinct frame (three separate distinct() jobs would
    each re-shuffle the fact). The absent key must sit INSIDE the
    global min/max envelope, or plain row-group stats skip everything
    and mask the bloom effect (TPC-H orderkeys are sparse: successor
    gaps exist). Shared by the probe and the regression test so the
    key-selection logic cannot desynchronize."""
    keys = li.select(key_col).distinct().cache()
    try:
        present = keys.orderBy(F.rand(7)).limit(1).first()[0]
        gap_row = (
            keys.withColumn("nxt", F.lead(key_col).over(Window.orderBy(key_col)))
            .filter(F.col("nxt") > F.col(key_col) + 1)
            .select((F.col(key_col) + 1).alias("gap"))
            .first()
        )
        # ADVICE r5 #3: a dense key domain has no successor gaps —
        # .first() returns None and the [0] below would die with an
        # opaque TypeError inside the shared regression test. Make the
        # precondition explicit instead.
        if gap_row is None:
            raise ValueError(
                "no in-range absent key: key domain is dense — pick a "
                f"different probe column than {key_col!r}"
            )
        absent = gap_row[0]
        ndv = keys.count()
    finally:
        keys.unpersist()
    return present, absent, ndv


def write_with_bloom(
    df,
    path: str,
    ndv: int,
    n_files: int,
    key_col: str = "l_orderkey",
    dictionary: bool = True,
) -> None:
    """Parquet write with a bloom filter on the lookup column.
    ``dictionary=False`` isolates the bloom mechanism at tiny SFs
    where parquet's dictionary filtering would otherwise already
    reject absent keys (the regression test's regime)."""
    w = (
        df.repartition(n_files)
        .write.mode("overwrite")
        .option(f"parquet.bloom.filter.enabled#{key_col}", "true")
        .option(f"parquet.bloom.filter.expected.ndv#{key_col}", str(ndv))
    )
    if not dictionary:
        w = w.option("parquet.enable.dictionary", "false")
    w.parquet(path)


def main(sf_dir: str, n_files: int) -> int:
    spark = get_spark()
    root = tempfile.mkdtemp(prefix="bloomprobe_")
    try:
        li = table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey", "l_quantity"
        )
        present, absent, ndv = key_probe(li)

        li.repartition(n_files).write.mode("overwrite").parquet(
            os.path.join(root, "plain")
        )
        write_with_bloom(li, os.path.join(root, "bloom"), ndv, n_files)
        for layout in ("plain", "bloom"):
            df = spark.read.parquet(os.path.join(root, layout))
            for lookup, key in (("present", present), ("absent", absent)):
                t0 = time.time()
                m = scan_metric_sum(
                    df.filter(F.col("l_orderkey") == key).groupBy().count(),
                    keys=("numOutputRows",),
                )
                print(
                    json.dumps(
                        {
                            "probe": "bloom_point_lookup",
                            "layout": layout,
                            "lookup": lookup,
                            "scan_rows": m.get("numOutputRows"),
                            "wall_s": round(time.time() - t0, 3),
                        }
                    ),
                    flush=True,
                )
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    sys.exit(main(sf, n))
