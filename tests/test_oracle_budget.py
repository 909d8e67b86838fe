"""Oracle-cost budget guard (no Spark involved).

The driver runs every oracle_sql() on DuckDB at sf0.01 alongside the
Spark query; an oracle that silently regresses to an all-pairs or
exponentially-inlined plan (both have happened: the O(n²)
list_intersect Jaccard forms cost 27s each, the un-MATERIALIZED
recursive PageRank CTE cost 198s) eats the driver's whole correctness
budget. This test runs the full oracle suite on DuckDB and fails if
any single oracle exceeds its per-query budget or the suite exceeds
the total budget.
"""

from __future__ import annotations

import os
import time

import duckdb

import __spark_entry__ as entrymod
from meepo_spark.catalog import TABLES

SF_DIR_MID = "/root/testdata/sf0.01"
PER_QUERY_BUDGET_S = 8.0
TOTAL_BUDGET_S = 90.0


def test_every_oracle_fits_the_driver_budget():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR_MID, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    oracles = entrymod.oracle_sql()
    total = 0.0
    slow: list[tuple[str, float]] = []
    for name, sql in oracles.items():
        t0 = time.time()
        con.execute(sql).fetchall()
        dt = time.time() - t0
        total += dt
        if dt > PER_QUERY_BUDGET_S:
            slow.append((name, round(dt, 1)))
    assert not slow, f"oracles over the {PER_QUERY_BUDGET_S}s budget: {slow}"
    assert total < TOTAL_BUDGET_S, f"oracle suite took {total:.1f}s"
