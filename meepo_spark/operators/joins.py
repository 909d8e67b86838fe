"""Join operators Spark lacks natively: as-of join and range join.

Both are library functions that emit rewritten DataFrame plans
(SURVEY.md §4.3#4) — no custom Catalyst rule, so Catalyst/AQE still
optimize the emitted plan.

The as-of join is the engine's core temporal primitive: meepo's event
store answers "state of pk as of t" by replaying the latest event ≤ t
(ref: meepo/apps/eventsourcing/event_store.py — module path per
SURVEY.md §0). A naive implementation joins all pairs then filters;
this one is join-free: union both sides, one sort per key, carry the
last right-side row forward with last(ignorenulls) — O(n log n) per
key partition, no pair blow-up, no skew amplification. At 100 TB this
is a single shuffle on the key column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    tolerance: str | None = None,
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` within the same ``on`` key(s).

    ``right_values`` are the right columns to carry (renamed as-is, so
    they must not collide with left columns). ``tolerance`` (an
    INTERVAL string, e.g. ``'3 days'``) optionally voids matches older
    than ``left_ts - tolerance``.

    Ties on ``right_ts`` within a key resolve to the row that sorts
    last by ``right_values`` — dedupe the right side first if exact
    determinism on ties matters.
    """
    keys = [on] if isinstance(on, str) else list(on)

    lt = left.withColumn("__ts", F.col(left_ts).cast("timestamp")).withColumn(
        "__side", F.lit(1)
    )
    rt = right.select(
        *keys,
        F.col(right_ts).cast("timestamp").alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c) for c in right_values],
    )
    # Align schemas: left gains null right_values, right gains null left cols.
    left_only = [c for c in lt.columns if c not in rt.columns]
    for c in right_values:
        lt = lt.withColumn(c, F.lit(None).cast(dict(rt.dtypes)[c]))
    for c in left_only:
        rt = rt.withColumn(c, F.lit(None).cast(dict(lt.dtypes)[c]))
    unioned = lt.unionByName(rt.select(*lt.columns))

    # Rights sort before lefts at equal ts (__side 0 < 1) so an event
    # AT t matches a left row AT t. last(ignorenulls) carries each
    # right value forward within the key partition.
    w = W.partitionBy(*keys).orderBy("__ts", "__side")
    carried = unioned
    for c in right_values:
        carried = carried.withColumn(c, F.last(c, ignorenulls=True).over(w))
    if right_ts != "__ts":
        carried = carried.withColumn(
            "__matched_ts", F.last(F.when(F.col("__side") == 0, F.col("__ts")), True).over(w)
        )
    out = carried.filter(F.col("__side") == 1)
    if tolerance is not None:
        expired = F.col("__matched_ts") < F.col("__ts") - F.expr(f"INTERVAL {tolerance}")
        for c in right_values:
            out = out.withColumn(c, F.when(expired, F.lit(None)).otherwise(F.col(c)))
    return out.drop("__side", "__ts", "__matched_ts")


def range_join(
    left: DataFrame,
    right: DataFrame,
    condition: Column,
    how: str = "inner",
    bucket: tuple[Column, Column, str] | None = None,
) -> DataFrame:
    """Interval/theta join. Without ``bucket`` this is Spark's
    nested-loop/broadcast path (fine when one side is small).

    ``bucket=(left_point_expr, right_interval_start_expr, width)``
    adds an equi-join key floor(point / width) == floor(start / width)
    so Catalyst plans a hash join instead of a nested loop — the
    standard scale rewrite when right intervals are at most ``width``
    long. Caller guarantees interval_length <= width (else widen or
    explode to multiple buckets).
    """
    if bucket is None:
        return left.join(right, condition, how)
    lpt, rstart, width = bucket
    lb = left.withColumn("__bk", F.floor(lpt / F.expr(width)))
    # right interval may straddle one bucket boundary → explode to 2
    rb = right.withColumn(
        "__bk", F.explode(F.array(F.floor(rstart / F.expr(width)), F.floor(rstart / F.expr(width)) + 1))
    )
    return lb.join(rb, (lb["__bk"] == rb["__bk"]) & condition, how).drop("__bk")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Skew-resistant equi-join: a hot key on the ``big`` side (one
    key holding a large fraction of rows) funnels an ordinary shuffle
    join into a single straggler task. Salting splits each big-side
    key across ``salt`` sub-partitions (random per row) and replicates
    the ``small`` side once per salt value, so the hot key's rows land
    on ``salt`` tasks instead of one. Result set is identical to
    ``big.join(small, on, how)``; the salt column never escapes.

    AQE's skew-join split (on by default in session.py) handles most
    skew after the fact; explicit salting is for the cases AQE can't
    re-plan — skewed BUILD sides, or stable production jobs where the
    skew is known ahead of time. Cost: |small| × salt replication, so
    use with broadcast-sized or dimension-sized small sides only.
    """
    big_s = big.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return big_s.join(small_s, [on, "__salt"], how).drop("__salt")
