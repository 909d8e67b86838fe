"""Data-layout operators: z-order (Morton) clustering for
multi-dimensional file pruning.

A sort on column A gives parquet files tight min/max ranges on A —
and useless ones on B: a reader filtering on B must open every file.
Interleaving the bits of fixed-width ranks of A and B (Morton code)
and sorting by THAT gives every file a tight range on BOTH columns,
so min/max file skipping works for predicates on either. This is the
standard lakehouse OPTIMIZE ZORDER BY mechanism, built here from
plain DataFrame ops: a bounds aggregate, integer bit arithmetic, one
range-partitioned sort, and a partitioned write.

At 100 TB: the only full-data cost is the sort's shuffle (which a
periodic compaction job was paying anyway); bounds are a 1-row agg.
Pruning effectiveness is verified from parquet footer statistics in
``tests/test_scale.py`` — the same stats a real reader consults.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 8  # 256 buckets per dimension -> 16-bit Morton key for 2 cols


def _bucket(col: Column, lo: Column, hi: Column) -> Column:
    """Scale a numeric column to an integer rank in [0, 2^ZBITS)."""
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1))
    r = F.floor(((col - lo) / span) * (2**ZBITS)).cast("long")
    return F.least(F.greatest(r, F.lit(0)), F.lit(2**ZBITS - 1))


def _interleave(a: Column, b: Column) -> Column:
    """Morton-interleave two ZBITS-wide integers (a gets even bits)."""
    out = F.lit(0)
    for i in range(ZBITS):
        bit_a = F.shiftrightunsigned(a, i).bitwiseAND(1)
        bit_b = F.shiftrightunsigned(b, i).bitwiseAND(1)
        out = (
            out.bitwiseOR(F.shiftleft(bit_a, 2 * i))
            .bitwiseOR(F.shiftleft(bit_b, 2 * i + 1))
        )
    return out


def zorder_write(
    df: DataFrame,
    cols: tuple[str, str],
    out_dir: str,
    files: int = 8,
) -> None:
    """Write ``df`` as ``files`` parquet files clustered by the Morton
    key of ``cols`` — each output file covers a small rectangle of the
    (colA, colB) value space, so min/max skipping prunes on both."""
    a, b = cols
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(a), F.max(a), F.min(b), F.max(b)
    ).first()
    key = _interleave(
        _bucket(F.col(a), F.lit(lo_a), F.lit(hi_a)),
        _bucket(F.col(b), F.lit(lo_b), F.lit(hi_b)),
    )
    (
        df.withColumn("__z", key)
        .repartitionByRange(files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def clustered_write(
    df: DataFrame,
    rank_a: Column,
    rank_b: Column,
    out_dir: str,
    files: int,
) -> int:
    """`zorder_write` with CALLER-supplied integer ranks (already in
    [0, 2^ZBITS)) — for dimensions that aren't plain numeric ranges: a
    dense rank of an enumerable string key (CDC table names), a hash
    bucket, a date ordinal. One range-partitioned sort on the Morton
    key, one file per range — the caller sizes ``files`` from actual
    bytes / target (the OPTIMIZE size contract). Returns the file
    count written. ``rank_b``'s bits land at the odd (higher)
    positions — put the dimension whose predicate should win the
    first file split there. Morton kernel shared with
    operators/zorder.py (one implementation to test)."""
    import os

    from meepo_spark.operators.zorder import interleave_bits

    key = interleave_bits([rank_a, rank_b], bits=ZBITS)
    (
        df.withColumn("__z", key)
        .repartitionByRange(files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    return sum(1 for f in os.listdir(out_dir) if f.endswith(".parquet"))


def compact_files(
    spark,
    src_dir: str,
    out_dir: str,
    target_bytes: int = 256 * 1024 * 1024,
) -> int:
    """Small-file compaction (the OPTIMIZE maintenance job): rewrite a
    directory of fragmented parquet into ceil(total/target) files.
    Returns the output file count.

    Streaming sinks and fine-grained partitioned writes accumulate
    KB-scale files; at 100 TB the listing alone becomes a bottleneck
    and every scan pays per-file open cost. Sizing from the ACTUAL
    byte total (not file count) keeps output at the 128-512 MB sweet
    spot regardless of how fragmented the input was. coalesce (not
    repartition) merges without a shuffle — compaction is IO-bound
    and needs no redistribution; pair with zorder_write when the
    rewrite should also cluster."""
    import math
    import os

    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(src_dir)
        for f in files
        if f.endswith(".parquet")
    )
    n_out = max(1, math.ceil(total / target_bytes))
    spark.read.parquet(src_dir).coalesce(n_out).write.mode(
        "overwrite"
    ).parquet(out_dir)
    return sum(
        1 for f in os.listdir(out_dir) if f.endswith(".parquet")
    )


def upsert_by_partition(
    base_dir: str,
    updates: DataFrame,
    partition_col: str = "event_date",
) -> list[str]:
    """Copy-on-write partition upsert — the lakehouse MERGE shape
    without a table format: with ``partitionOverwriteMode=dynamic``,
    ``mode("overwrite")`` replaces ONLY the partitions present in
    ``updates``; every untouched partition's files stay physically
    identical (asserted by tests/test_scale.py via inode+mtime).

    At 100 TB this is the difference between rewriting a 3-year store
    and rewriting one day: write amplification is bounded by the
    updated partitions' size. The caller supplies updates already
    carrying ``partition_col``; returns the affected partition values
    (computed BEFORE the write so the plan isn't re-run after).

    A true MERGE (row-level upsert inside a partition) composes this
    with a read-modify of just the affected partitions: read old rows
    of those partitions, anti-join on the key, union the updates —
    still O(touched partitions), never O(store).
    """
    spark = updates.sparkSession
    affected = [r[0] for r in updates.select(partition_col).distinct().collect()]
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        updates.write.mode("overwrite").partitionBy(partition_col).parquet(base_dir)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return sorted(str(a) for a in affected)
