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
    import argparse

    parser = argparse.ArgumentParser(
        description="Run the oracle gate under a bare driver-style "
        "SparkSession (no session.py confs)."
    )
    parser.add_argument(
        "sf_dir",
        nargs="?",
        default="/root/testdata/sf0.01",
        help="fixture dir (default /root/testdata/sf0.01)",
    )
    parser.add_argument(
        "names", nargs="*", help="query names to check (default: all)"
    )
    parser.add_argument(
        "--json",
        dest="json_path",
        metavar="PATH",
        help="serialize per-query results (CORRECTNESS shape + timing)",
    )
    ns = parser.parse_args()
    sys.exit(check(ns.sf_dir, names=ns.names or None, json_path=ns.json_path))
