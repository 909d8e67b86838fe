"""Session-scoped lineitem price-cents histogram (optimization r11).

Four graded queries reduce lineitem to the SAME value-grain frame —
per-(l_returnflag, price cents) counts/weights — and each paid its
own fact pass (or two: the census+refine quantile operator scans its
input twice) plus, for g11, a per-invocation localCheckpoint:

- v4_exact_percentiles: quartiles over (all, discounted) cents,
- g11_weighted_median: quantity-weighted cumulative cents,
- g12_mad: median + MAD over cents,
- g27_approx_percentile_tolerance: nine exact probe quantiles.

One histogram build serves all of them through the quantile
operators' ``weight`` path (property-tested equal to the expanded
multiset). Cache semantics (keying, cap, LRU, eviction) are the
shared ``SessionFrameCache`` discipline — same as doc_cache's
tokenized/posting frames: in-memory, (applicationId, sf_dir)-keyed,
built lazily inside the first consuming query's timed region,
nothing persisted across runs.

Scale posture: the frame saturates at |flags| × the cents domain
(~10⁷ values) — a bounded derived artifact (the dq10 argument), vs
each consumer re-scanning the 100 TB fact. The GK sketch passes and
anything needing raw row order still scan the fact; only the
value-multiset reductions read the histogram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meepo_spark.catalog import table
from meepo_spark.queries._session_cache import SessionFrameCache

_CACHE = SessionFrameCache(max_per_app=3)


def _build(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return l.groupBy("l_returnflag", cents.alias("cents")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("l_discount") > 0.05).cast("long")).alias("n_disc"),
        F.sum(F.col("l_quantity").cast("long")).alias("qty"),
    )


def lineitem_cents_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_returnflag, cents, n, n_disc, qty): row count, count with
    l_discount > 0.05, and total quantity per distinct price-cents
    value per return flag."""
    return _CACHE.get(spark, sf_dir, _build)
