"""Driver-session robustness check: run the full oracle gate under a
BARE default SparkSession created before the engine is imported —
exactly what the grading driver does. None of session.py's confs
apply; the engine must pin its own conventions per-query (table()
sets the session timezone) and survive Spark 4 defaults (ANSI on,
default shuffle partitions, default AQE).

Usage: python tools/bare_check.py [sf_dir] [query ...] [--json PATH]

--json serializes the full per-query result (the CORRECTNESS_r*.json
shape plus timing) so the bare gate is diffable like SELFCHECK_r*.json
(VERDICT r7 #6) instead of living only in a log.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
print(
    "bare session — ansi:",
    spark.conf.get("spark.sql.ansi.enabled"),
    "tz:",
    spark.conf.get("spark.sql.session.timeZone"),
    "aqe:",
    spark.conf.get("spark.sql.adaptive.enabled"),
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.selfcheck import check  # noqa: E402  (after session exists)

if __name__ == "__main__":
    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        del args[i : i + 2]
    sf = args[0] if args else "/root/testdata/sf0.01"
    names = args[1:] or None
    sys.exit(check(sf, names=names, json_path=json_path))
