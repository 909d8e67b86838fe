"""Per-query isolated-warm timer + plan capture (optimization rounds).

Measures single queries the way the bench does (noop sink, warmed
JVM/codegen + Python worker pool, min-of-N) but in isolation, so a
number reflects the query and its session caches rather than the
bench's alphabetical neighborhood. Optionally dumps
``explain("formatted")`` to a file — the before/after evidence the
optimization deliverable (plans/r10/) requires.

Usage:
    python tools/qtime.py [--sf DIR] [--runs N] [--plan-dir DIR] \
        [--suffix before|after] query [query ...]

Prints one JSON line per query:
    {"query": name, "best": s, "runs": [s, ...], "plan": path|null}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

import __spark_entry__ as entrymod
from meepo_spark.session import get_spark


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = get_spark("meepo-spark-qtime")
    qs = entrymod.queries()
    unknown = [q for q in args.queries if q not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)

    # same warm-up as bench.py: flagship for JVM/codegen, tiny pandas
    # UDF for the Python worker pool
    _force(qs[entrymod.FLAGSHIP](spark, args.sf))
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    _force(spark.range(10_000).repartition(64).select(_warm("id")))

    for name in args.queries:
        spark.sparkContext.setJobDescription(f"qtime:{name}")
        plan_path = None
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            plan_path = os.path.join(args.plan_dir, f"{name}_{args.suffix}.txt")
            df = qs[name](spark, args.sf)
            with open(plan_path, "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        times = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            _force(qs[name](spark, args.sf))
            times.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({
            "query": name,
            "best": min(times),
            "runs": times,
            "plan": plan_path,
        }), flush=True)


if __name__ == "__main__":
    main()
