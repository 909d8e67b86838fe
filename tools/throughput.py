"""Parity-path throughput probe — the repeatable form of BASELINE.md's
"measured: parity-path throughput" row.

Protocol (end-to-end, cold streaming start, matching meepo's
binlog→store→consumer delivery path):
  1. adapt the `events` fixture to ChangeEvent rows (cdc/events.py),
     land them as a source directory of parquet files;
  2. run the streaming ingest: readStream → partitioned event store
     (availableNow trigger — processes the whole backlog then stops);
  3. compact the store to the latest-per-pk snapshot;
  4. report events/sec over the full wall time (startup included — a
     deliberately conservative number; at production batch cadence the
     fixed ~2 s micro-batch startup amortizes away).

Prints ONE JSON line:
  {"metric": "parity_events_per_sec", "value": N, "unit": "events/sec",
   "events": E, "wall_s": W, "sf": ...}

Usage: python tools/throughput.py [sf_dir]   (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meepo_spark.cdc.event_store import EventStore
from meepo_spark.cdc.events import events_as_changes, read_change_stream
from meepo_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("meepo-spark-throughput")

    work = tempfile.mkdtemp(prefix="throughput_")
    src = os.path.join(work, "source")
    store_path = os.path.join(work, "store")
    snap = os.path.join(work, "snapshot")
    ck = os.path.join(work, "ck")
    try:
        changes = events_as_changes(spark, sf_dir)
        changes.write.mode("overwrite").parquet(src)
        n_events = spark.read.parquet(src).count()

        t0 = time.perf_counter()
        stream = read_change_stream(spark, src)
        store = EventStore(spark, store_path)
        q = store.streaming_sink(stream, ck).trigger(availableNow=True).start()
        q.awaitTermination()
        store.compact(snap)
        wall = time.perf_counter() - t0

        print(
            json.dumps(
                {
                    "metric": "parity_events_per_sec",
                    "value": round(n_events / wall, 1),
                    "unit": "events/sec",
                    "events": n_events,
                    "wall_s": round(wall, 2),
                    "sf": sf,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
