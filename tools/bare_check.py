"""Driver-session robustness check: run the full oracle gate under a
BARE default SparkSession created before the engine is imported —
exactly what the grading driver does. None of session.py's confs
apply; the engine must pin its own conventions per-query (table()
sets the session timezone) and survive Spark 4 defaults (ANSI on,
default shuffle partitions, default AQE).

Usage: python tools/bare_check.py [sf_dir]
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
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.exit(check(sf))
