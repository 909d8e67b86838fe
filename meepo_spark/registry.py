"""Graded-query registry.

Every operator from SURVEY.md §2 lands here as a named query: a
callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible)
the equivalent DuckDB oracle SQL. ``__spark_entry__.py`` exposes the
registry to the driver, which hash-matches Spark vs DuckDB at sf0.01.

Canonicalization discipline (FIXTURES.md):
  * alias every computed column identically on both sides,
  * round double aggregates to 2dp on both sides,
  * render timestamps as strings / dates (never raw timestamps —
    parquet ns vs Spark µs precision would drift),
  * in DuckDB, CAST integer sums to BIGINT (DuckDB widens to HUGEINT).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query (and optional DuckDB oracle SQL) to the
    graded registry. Queries without an oracle get the driver's weaker
    rows-only check (reserved for genuinely non-SQL-expressible ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            # strip line comments BEFORE collapsing whitespace — a
            # surviving '--' would swallow the rest of the flattened SQL
            lines = [ln.split("--", 1)[0] for ln in oracle.splitlines()]
            ORACLES[name] = " ".join(" ".join(lines).split())
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side-effects run."""
    from meepo_spark import queries  # noqa: F401  (imports submodules)
