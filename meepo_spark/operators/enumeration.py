"""Distributed row enumeration — global (or per-group) ``row_number``
without the single-task sort.

``row_number() OVER (ORDER BY ...)`` with no partition — or partitioned
by a tiny-cardinality key — collapses the input into one WindowExec
task per key: the canonical Spark scale trap (VERDICT r2 #1–#4). The
fix used across the registry (o7, m3, v11, l17, e3, a8, o6) is the
bucketed enumeration discipline:

  1. assign each row a deterministic bucket that is an EXPRESSION of
     the leading sort key and monotone with the target ordering
     (equal-width key ranges, md5 prefixes, calendar truncations —
     never ``spark_partition_id()`` after ``repartitionByRange``,
     whose sampled boundaries differ per plan consumer);
  2. count rows per (group, bucket) — a tiny hash aggregate;
  3. turn counts into per-group running offsets with a window over the
     BUCKET AGGREGATE (bounded: one row per bucket), broadcast back;
  4. per-(group, bucket) ``row_number`` + offset = the exact global
     ordinal under the full ordering.

Every wide stage parallelizes across buckets; the only global
structure is the offset vector. ``tools/plancheck.py`` red-flags the
unpartitioned/tiny-key window class and waives the bounded offset
windows this helper emits.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["bucketed_row_number", "bucketed_ntile", "bucketed_prefix_sum"]

# ADVICE r3 #2 — hard contract on every helper in this module: the
# bucket expression must yield at most MAX_BUCKETS distinct values per
# part_cols group (fixed-width divisions of a bounded domain, md5
# prefixes, calendar truncations all qualify). The offsets frame is
# F.broadcast-hinted under that bound (<= a few MB); a data-growing
# bucket expression (e.g. a raw key) would make the hint a driver-OOM
# risk, so callers must divide by a width that caps the count.
MAX_BUCKETS = 65536


def _offset_guard(ordinal: Column) -> Column:
    """Executor-side enforcement of the MAX_BUCKETS contract (ADVICE
    r4): woven into the offsets projection as a +0 term so Catalyst
    cannot prune it, it raises a diagnosable error the moment any
    group's bucket ordinal exceeds MAX_BUCKETS — instead of letting a
    data-growing bucket expression ride the F.broadcast hint into a
    driver OOM. Costs one row_number over the already-tiny bucket
    aggregate (same partition+order as the offset window, so it folds
    into the same WindowExec)."""
    return F.coalesce(
        F.assert_true(
            ordinal <= MAX_BUCKETS,
            F.lit(
                "bucketed enumeration: more than "
                f"{MAX_BUCKETS} buckets in one group — the bucket "
                "expression grows with the data; divide by a width "
                "that caps the distinct-bucket count"
            ),
        ).cast("bigint"),
        F.lit(0),
    )


def bucketed_row_number(
    df: DataFrame,
    bucket: Column,
    order_cols: Sequence[Column],
    part_cols: Sequence[str] = (),
    out: str = "rn",
    bucket_asc: bool = True,
) -> DataFrame:
    """Add ``out`` = row_number over (PARTITION BY part_cols ORDER BY
    order_cols) computed via the bucketed-enumeration discipline.

    ``bucket`` must be monotone (non-decreasing if ``bucket_asc``,
    non-increasing otherwise) with the leading ``order_cols`` key, and
    rows that tie on the leading key must share a bucket — both hold
    automatically when the bucket is a deterministic function of that
    key (floor-division, md5 prefix, date_trunc).

    ``bucket`` must be NON-NULL for every row: a NULL bucket groups in
    the count branch but never matches the equi-join back, silently
    DROPPING those rows. Callers with nullable keys must split the
    null stratum out first and enumerate it separately (see
    o6_null_ordering, which derives NULLS FIRST/LAST ranks
    arithmetically from per-stratum enumerations).
    """
    part = list(part_cols)
    b = df.withColumn("__bkt", bucket)
    counts = b.groupBy(*part, "__bkt").agg(F.count(F.lit(1)).alias("__n"))
    ob = F.col("__bkt").asc() if bucket_asc else F.col("__bkt").desc()
    off_w = (
        (W.partitionBy(*part) if part else W).orderBy(ob)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    chk_w = (W.partitionBy(*part) if part else W).orderBy(ob)
    offsets = counts.select(
        *part, "__bkt",
        (
            F.coalesce(F.sum("__n").over(off_w), F.lit(0))
            + _offset_guard(F.row_number().over(chk_w))
        ).alias("__off"),
    )
    rn_w = W.partitionBy(*part, "__bkt").orderBy(*order_cols)
    return (
        b.join(F.broadcast(offsets), [*part, "__bkt"])  # bcast: bucket
        .withColumn(out, F.row_number().over(rn_w) + F.col("__off"))
        .drop("__bkt", "__off")
    )


def bucketed_ntile(
    df: DataFrame,
    key_asc: Column,
    order_cols: Sequence[Column],
    n_tiles: int,
    part_cols: Sequence[str] = (),
    out: str = "tile",
    n_buckets: int = 32,
) -> DataFrame:
    """Add ``out`` = NTILE(n_tiles) OVER ([PARTITION BY part_cols]
    ORDER BY order_cols) without the per-partition single-task sort.

    The global rank comes from the bucketed-enumeration discipline
    over equal-width buckets of ``key_asc`` (a numeric expression
    ascending-monotone with the ordering's primary key; a lossy
    monotone map such as a double cast is fine — ties share a
    bucket), with the per-group (lo, hi, N) bounds from one broadcast
    aggregate. The tile is then the closed-form function of
    (rank, N): NTILE's first N % n_tiles tiles take ceil(N/n_tiles)
    rows, the rest floor(N/n_tiles) — bit-identical to the window
    function whenever order_cols is a total order. Used by
    m3_rfm_segments (global quartiles) and v11_equidepth_histogram
    (per-flag deciles).

    ``key_asc`` must be NON-NULL for every row: a NULL key yields a
    NULL pid, which ``F.least`` silently coerces into the top bucket
    — NOT where NTILE's null ordering would place it. Split nullable
    keys into strata first (the o6 pattern).
    """
    part = list(part_cols)
    k = key_asc.cast("double")
    aggs = [
        F.min(k).alias("__lo"), F.max(k).alias("__hi"),
        F.count(F.lit(1)).alias("__N"),
    ]
    rng = df.groupBy(*part).agg(*aggs) if part else df.agg(*aggs)
    width = (F.col("__hi") - F.col("__lo")) / n_buckets + F.lit(1e-12)
    joined = (
        df.join(F.broadcast(rng), part) if part  # bcast: bucket
        else df.crossJoin(F.broadcast(rng))  # bcast: bucket
    )
    p = joined.withColumn(
        "__pid",
        F.least(F.floor((k - F.col("__lo")) / width), F.lit(n_buckets - 1)),
    )
    counts = p.groupBy(*part, "__pid").agg(F.count(F.lit(1)).alias("__n"))
    off_w = (
        (W.partitionBy(*part) if part else W).orderBy("__pid")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = counts.select(
        *part, "__pid",
        F.coalesce(F.sum("__n").over(off_w), F.lit(0)).alias("__off"),
    )
    rn_w = W.partitionBy(*part, "__pid").orderBy(*order_cols)
    ranked = p.join(F.broadcast(offsets), [*part, "__pid"]).withColumn(  # bcast: bucket
        "__rn", F.row_number().over(rn_w) + F.col("__off")
    )
    q, r = F.floor(F.col("__N") / n_tiles), F.col("__N") % n_tiles
    big = r * (q + 1)  # rows covered by the r larger tiles
    tile = F.when(
        F.col("__rn") <= big, F.floor((F.col("__rn") - 1) / (q + 1)) + 1
    ).otherwise(r + F.floor((F.col("__rn") - big - 1) / q) + 1)
    return ranked.withColumn(out, tile).drop(
        "__pid", "__off", "__rn", "__lo", "__hi", "__N"
    )


def bucketed_prefix_sum(
    df: DataFrame,
    bucket: Column,
    order_cols: Sequence[Column],
    vals: dict[str, str],
    part_cols: Sequence[str] = (),
    frame_end: int = 0,
    totals: bool = False,
    tot_suffix: str = "_tot",
) -> DataFrame:
    """Running SUMs without the single-task (or tiny-key) sort: for
    each ``out: src`` in ``vals``, adds ``out`` = SUM(src) OVER
    (PARTITION BY part_cols ORDER BY order_cols ROWS UNBOUNDED
    PRECEDING .. ``frame_end``) — ``frame_end=0`` is CURRENT ROW
    (CDFs, cumulative weights), ``frame_end=-1`` is 1 PRECEDING
    (rank-before counts, the Mann-Whitney shape).

    Same discipline as :func:`bucketed_row_number`: per-(part, bucket)
    value sums (tiny hash aggregate), a window over that bounded
    bucket aggregate for the per-group running offsets (broadcast
    back), then a per-(part, bucket) local cumsum — every wide stage
    parallelizes across buckets. Added for VERDICT r4: the runtime
    waiver audit caught g11/v13/l21 windowing over per-DISTINCT-value
    frames that grow linearly with the fact (594k rows at sf0.1 for
    g11's cents) — "distinct values" is NOT a bound for continuous
    measures.

    Contract: ``bucket`` monotone non-decreasing with the leading
    order key, ties on the full ordering share a bucket, NON-NULL,
    and <= MAX_BUCKETS distinct values per group; every ``src``
    column must be non-null (the helper folds coalesce(sum, 0), so an
    all-null PREFIX yields 0, not SQL's NULL).

    With ``totals=True`` also joins (broadcast) per-group grand
    totals as ``out + tot_suffix`` — replacing the
    `SUM(x) OVER (PARTITION BY tiny_key)` full-frame window with a
    second pass over the already-tiny bucket aggregate.
    """
    part = list(part_cols)
    b = df.withColumn("__bkt", bucket)
    sums = b.groupBy(*part, "__bkt").agg(
        *[F.sum(src).alias(f"__s_{out}") for out, src in vals.items()]
    )
    off_w = (
        (W.partitionBy(*part) if part else W)
        .orderBy(F.col("__bkt").asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    chk_w = (W.partitionBy(*part) if part else W).orderBy(F.col("__bkt").asc())
    # ADVICE r5 #2: weave the guard into EVERY offset column, not just
    # the first — a caller that projects away the first output column
    # would let Catalyst prune the only guarded expression and the
    # executor-side bucket-blowup assert would silently vanish. All
    # copies fold into the same WindowExec (identical partition+order).
    guard = _offset_guard(F.row_number().over(chk_w))
    offsets = sums.select(
        *part,
        "__bkt",
        *[
            (F.coalesce(F.sum(f"__s_{out}").over(off_w), F.lit(0)) + guard).alias(
                f"__o_{out}"
            )
            for out in vals
        ],
    )
    res = b.join(F.broadcast(offsets), [*part, "__bkt"])  # bcast: bucket
    loc_w = (
        W.partitionBy(*part, "__bkt")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, frame_end)
    )
    for out, src in vals.items():
        res = res.withColumn(
            out, F.coalesce(F.sum(src).over(loc_w), F.lit(0)) + F.col(f"__o_{out}")
        )
    res = res.drop("__bkt", *[f"__o_{out}" for out in vals])
    if totals:
        tot = sums.groupBy(*part).agg(
            *[F.sum(f"__s_{out}").alias(out + tot_suffix) for out in vals]
        )
        res = (
            res.join(F.broadcast(tot), part)  # bcast: bucket
            if part
            else res.crossJoin(F.broadcast(tot))  # bcast: bucket
        )
    return res
